package graft.pol

import java.io.StringReader
import java.nio.charset.StandardCharsets
import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

/** Minimal offline `.xlsx` reader (S5) — enough of SpreadsheetML to
  * load the reference's dimension workbook (`game_id_to_pools.xlsx`,
  * `etl/transform.py:27-58`) without any spreadsheet dependency: an
  * xlsx file is a zip holding `xl/sharedStrings.xml` (the string pool)
  * and `xl/worksheets/sheet1.xml` (rows of cells). Driver-side by
  * design — dimension workbooks are dozens of rows that enter the
  * query as a broadcast side; bulk data never arrives as xlsx.
  *
  * Supported cell kinds: shared string (`t="s"`), inline string
  * (`t="inlineStr"`), boolean (`t="b"`), and numeric/default (`<v>`
  * text kept VERBATIM — "6371" stays "6371", no float round-trip).
  * Sparse rows keep gaps as nulls via the `r="B3"` cell reference.
  */
object Xlsx {

  /** All rows of the first worksheet, in document order; cells are
    * raw strings (null for gaps), rows ragged to their last cell.
    */
  def readRows(path: String): Seq[Seq[String]] = {
    val zf = new ZipFile(path)
    try {
      def slurp(name: String): Option[String] =
        Option(zf.getEntry(name)).map { e =>
          new String(zf.getInputStream(e).readAllBytes(), StandardCharsets.UTF_8)
        }
      val shared = slurp("xl/sharedStrings.xml")
        .map(parseSharedStrings).getOrElse(Vector.empty)
      // resolve the FIRST sheet through workbook.xml + its rels (sheet
      // order is workbook metadata — after reordering, the first tab
      // can be stored as any sheetN.xml); fall back to the
      // openpyxl/pandas default layout
      val sheetPath = (for {
        wb <- slurp("xl/workbook.xml")
        rels <- slurp("xl/_rels/workbook.xml.rels")
        rid <- firstSheetRelId(wb)
        target <- relTarget(rels, rid)
      } yield if (target.startsWith("/")) target.stripPrefix("/")
        else s"xl/$target").getOrElse("xl/worksheets/sheet1.xml")
      val sheet = slurp(sheetPath).getOrElse(
        throw new IllegalArgumentException(
          s"$path: no $sheetPath (not an xlsx workbook?)"))
      parseSheet(sheet, shared)
    } finally zf.close()
  }

  private def reader(xml: String) = {
    val f = XMLInputFactory.newInstance()
    // no DTD / external entities: the input is untrusted archive content
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new StringReader(xml))
  }

  /** r:id of the first `<sheet>` of workbook.xml (document order). */
  private[pol] def firstSheetRelId(workbookXml: String): Option[String] = {
    val r = reader(workbookXml)
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet") {
          (0 until r.getAttributeCount).foreach { i =>
            if (r.getAttributeLocalName(i) == "id")
              return Some(r.getAttributeValue(i))
          }
        }
      }
      None
    } finally r.close()
  }

  /** Target of the relationship with the given Id in a .rels part. */
  private[pol] def relTarget(relsXml: String, rid: String): Option[String] = {
    val r = reader(relsXml)
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship" &&
            r.getAttributeValue(null, "Id") == rid) {
          return Option(r.getAttributeValue(null, "Target"))
        }
      }
      None
    } finally r.close()
  }

  /** `<si>` entries; rich-text runs concatenate their `<t>` pieces. */
  private[pol] def parseSharedStrings(xml: String): Vector[String] = {
    val r = reader(xml)
    val out = Vector.newBuilder[String]
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si" => cur = new StringBuilder
          case "t" => inT = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
            if inT && cur != null =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "t" => inT = false
          case "si" => out += cur.toString; cur = null
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** "B3" → 0-based column index 1. */
  private[pol] def colIndex(cellRef: String): Int =
    cellRef.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  private[pol] def parseSheet(
      xml: String, shared: Vector[String]): Seq[Seq[String]] = {
    val r = reader(xml)
    val rows = Seq.newBuilder[Seq[String]]
    var row: mutable.SortedMap[Int, String] = null
    var cellCol = -1
    var cellType = ""
    var capture = false // inside <v>, or inside <is><t>
    var buf: StringBuilder = null
    def flushCell(): Unit = if (cellCol >= 0) {
      val raw = if (buf == null) null else buf.toString
      val value = (cellType, raw) match {
        case (_, null) => null
        case ("s", idx) => shared(idx.trim.toInt)
        case ("b", v) => if (v.trim == "1") "TRUE" else "FALSE"
        case (_, v) => v // numeric / inlineStr / formula-cached: verbatim
      }
      if (value != null) row(cellCol) = value
      cellCol = -1; cellType = ""; buf = null
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = mutable.SortedMap.empty
          case "c" if row != null =>
            cellCol = Option(r.getAttributeValue(null, "r"))
              .map(colIndex).getOrElse(row.size)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
          case "v" => capture = true; buf = new StringBuilder
          case "t" if cellType == "inlineStr" =>
            capture = true; if (buf == null) buf = new StringBuilder
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
            if capture =>
          buf.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" | "t" => capture = false
          case "c" => flushCell()
          case "row" if row != null =>
            val width = if (row.isEmpty) 0 else row.lastKey + 1
            rows += (0 until width).map(i => row.getOrElse(i, null))
            row = null
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    rows.result()
  }
}
