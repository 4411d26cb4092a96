package graft.pol

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark

/** S5: the engine must ingest the reference's actual dimension
  * artifact (an .xlsx workbook), not just the CSV stand-in. Two
  * angles: a generated workbook exercising every supported cell kind
  * (shared string, inline string, numeric, boolean, sparse gaps), and
  * the committed reference workbook proving xlsx ≡ CSV-fixture down
  * to the resolved schema.
  */
class XlsxSpec extends AnyFunSuite {

  /** Write a minimal workbook: just the two entries the reader needs. */
  private def writeWorkbook(
      sharedStrings: String, sheet: String): String = {
    val f = java.nio.file.Files.createTempFile("graft_xlsx", ".xlsx").toFile
    val zos = new ZipOutputStream(new FileOutputStream(f))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    entry("xl/sharedStrings.xml", sharedStrings)
    entry("xl/worksheets/sheet1.xml", sheet)
    zos.close()
    f.getAbsolutePath
  }

  test("parses shared strings, inline strings, numbers, booleans, gaps") {
    val sst =
      """<?xml version="1.0"?><sst><si><t>Game</t></si>
        |<si><t>Rich</t><t> Text</t></si></sst>""".stripMargin
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c>
        |  <c r="D1" t="b"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c>
        |  <c r="B2" t="inlineStr"><is><t>in line</t></is></c>
        |  <c r="C2"><v>0.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val rows = Xlsx.readRows(writeWorkbook(sst, sheet))
    assert(rows == Seq(
      Seq("Game", "42", null, "TRUE"),
      Seq("Rich Text", "in line", "0.5")))
  }

  test("numeric cell text is verbatim - integer ids never float-round-trip") {
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1"><v>6371</v></c><c r="B1"><v>10</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val rows = Xlsx.readRows(writeWorkbook("<sst/>", sheet))
    assert(rows == Seq(Seq("6371", "10")))
  }

  test("first sheet resolves through workbook rels, not a hardcoded name") {
    // after tab reordering the FIRST sheet can be stored as any
    // sheetN.xml — the reader must follow workbook.xml → rels
    val f = java.nio.file.Files.createTempFile("graft_xlsx_r", ".xlsx").toFile
    val zos = new ZipOutputStream(new FileOutputStream(f))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Main" sheetId="7" r:id="rId9"/>
        |<sheet name="Other" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships>
        |<Relationship Id="rId1" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId9" Target="worksheets/sheet3.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1"><v>WRONG</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    entry("xl/worksheets/sheet3.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1"><v>RIGHT</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    assert(Xlsx.readRows(f.getAbsolutePath) == Seq(Seq("RIGHT")))
  }

  test("column reference decoding handles multi-letter columns") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA3") == 26)
    assert(Xlsx.colIndex("AB12") == 27)
  }

  test("reference workbook loads and matches the committed CSV fixture") {
    val xlsxPath = "/root/reference/game_id_to_pools.xlsx"
    assume(new java.io.File(xlsxPath).canRead, s"$xlsxPath not present")
    val fromX = GameLookup.fromXlsx(spark, xlsxPath)
      .orderBy("row_idx").collect().toSeq
    val fromC = GameLookup.fromCsv(spark,
        "src/test/resources/lookup/game_lookup_ref.csv")
      .orderBy("row_idx").collect().toSeq
    assert(fromX == fromC)
    assert(fromX.nonEmpty)
  }

  test("resolved() over the xlsx dimension resolves the reference pool") {
    val xlsxPath = "/root/reference/game_id_to_pools.xlsx"
    assume(new java.io.File(xlsxPath).canRead, s"$xlsxPath not present")
    import spark.implicits._
    val dim = GameLookup.fromXlsx(spark, xlsxPath)
    val got = GameLookup.resolved(dim, Seq("6371").toDF("pool_id"))
      .collect()
    assert(got.length == 1)
    assert(got(0).getAs[Double]("min_bet") == 10.0)
    assert(got(0).getAs[collection.Seq[String]]("game_ids").toSeq == Seq("6371"))
  }
}
