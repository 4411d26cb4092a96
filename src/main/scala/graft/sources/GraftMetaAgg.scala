package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.LocalScan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.pol.PoolJsonSink
import graft.pol.PoolJsonSink.{BinStat, LongStat, TableManifest}

/** Metadata-only aggregate answering: `SELECT count(*) / count(c) /
  * min(c) / max(c) FROM t [GROUP BY splitcol]` resolved from the
  * committed manifest WITHOUT opening a single data file — the
  * Delta/Iceberg "metadata query" pattern, surfaced through DSv2
  * complete aggregate pushdown.
  *
  * What makes this sound at any table size:
  *  - every staged file records its EXACT row count (`__rows`) and
  *    per-statscol null count (`__nulls__<c>`) from the parquet
  *    footer at commit time, so `count(*)` is a sum over the manifest
  *    and `count(c)` is `Σ(rows − nulls)`;
  *  - zone maps record each file's min/max harvested from the same
  *    footers parquet itself trusts for row-group skipping, and
  *    parquet stats exclude nulls — exactly SQL MIN/MAX semantics;
  *  - GROUP BY pushes down only over VALUE-PURE columns: every live
  *    file must prove one constant group value (min == max with zero
  *    recorded nulls, or an all-null file — the NULL group) — the
  *    layout `optimize(split_by => col)` produces. Group rows are
  *    then file-set partitions of the manifest; per-group aggregates
  *    reduce over member files only.
  *  - coverage is checked per file: ANY live file missing a needed
  *    stat (older writer, oversized binary value, impure group value)
  *    fails the compile and the query falls back to the ordinary
  *    scan. Conservative, never a guess.
  *
  * Filtered aggregates compose through EXACT filter pushdown: when
  * the scan builder proves the pushed conjunction is precisely a file
  * set (MetadataDelete.allInFilesV1 — every live file all-in or
  * all-out), the aggregate reduces over the all-in files only and
  * `count(*) WHERE splitcol = v` is manifest arithmetic too;
  * otherwise the residual filter keeps Spark from offering the
  * pushdown and the query takes the data path. Supported value types
  * are the ones
  * whose manifest stats are bit-faithful to the Catalyst internal
  * value: LONG columns (LongStat is the raw INT64 footer stat) and
  * STRING/BINARY columns (BinStat's unsigned-lexicographic byte order
  * IS UTF8String/binary sort order). Timestamps are deliberately
  * excluded: their footer stat unit depends on the writer's
  * outputTimestampType conf, and a millis-written table would
  * silently misreport micros.
  */
object GraftMetaAgg {

  /** One compiled output column: SQL-facing field + the internal
    * value (boxed Long / UTF8String / Array[Byte] / null).
    */
  private case class Compiled(field: StructField, value: Any)

  /** Compile a pushed aggregation against the manifest, or None when
    * any piece is unanswerable from metadata alone. Ungrouped → one
    * row; grouped → one row per distinct proven group value.
    */
  def compile(
      m: TableManifest, fileSchema: StructType,
      agg: Aggregation,
      // exact-filter restriction: when the builder proved the pushed
      // conjunction is precisely a file set, aggregates reduce over
      // the all-in files only — `count(*) WHERE splitcol = v` is then
      // manifest arithmetic too
      fileSubset: Option[Set[String]] = None)
      : Option[(StructType, Array[InternalRow])] = {
    val files = fileSubset match {
      case Some(keep) => m.files.filter(keep)
      case None => m.files
    }
    def statOf(rel: String, c: String): Option[PoolJsonSink.ColStat] =
      m.stats.get(rel).flatMap(_.get(c))

    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        Some(r.fieldNames.head)
      case _ => None
    }

    def fileRows(rel: String): Option[Long] =
      statOf(rel, PoolJsonSink.RowsStatCol).collect {
        case LongStat(n, _) => n
      }
    def fileNulls(rel: String, c: String): Option[Long] =
      statOf(rel, s"${PoolJsonSink.NullsStatColPrefix}$c").collect {
        case LongStat(n, _) => n
      }

    def countStar(fs: Seq[String]): Option[Compiled] = {
      val counts = fs.map(fileRows)
      if (counts.exists(_.isEmpty)) None
      else Some(Compiled(
        StructField("count(*)", LongType, nullable = false),
        java.lang.Long.valueOf(counts.flatten.sum)))
    }

    /** `count(c)` = Σ(rows − nulls) — needs BOTH stats on every file. */
    def countCol(fs: Seq[String], col: String): Option[Compiled] = {
      val per = fs.map(f => for {
        r <- fileRows(f); n <- fileNulls(f, col)
      } yield r - n)
      if (per.exists(_.isEmpty)) None
      else Some(Compiled(
        StructField(s"count($col)", LongType, nullable = false),
        java.lang.Long.valueOf(per.flatten.sum)))
    }

    def minMax(fs: Seq[String], col: String, isMin: Boolean)
        : Option[Compiled] = {
      val field = fileSchema.fields.find(_.name == col).getOrElse {
        return None
      }
      def pick(l: Long, r: Long) = if (isMin) math.min(l, r) else math.max(l, r)
      def pickB(l: Array[Byte], r: Array[Byte]) = {
        val c = PoolJsonSink.unsignedCompare(l, r)
        if ((c <= 0) == isMin) l else r
      }
      val value: Option[Any] = field.dataType match {
        case LongType =>
          val ss = fs.map(f => statOf(f, col).collect {
            case LongStat(mn, mx) => if (isMin) mn else mx
          })
          if (ss.exists(_.isEmpty)) return None
          if (ss.isEmpty) Some(null)
          else Some(java.lang.Long.valueOf(ss.flatten.reduce(pick)))
        case StringType | BinaryType =>
          val ss = fs.map(f => statOf(f, col).collect {
            case BinStat(mn, mx) => if (isMin) mn else mx
          })
          if (ss.exists(_.isEmpty)) return None
          if (ss.isEmpty) Some(null)
          else {
            val bytes = ss.flatten.reduce(pickB)
            Some(if (field.dataType == StringType)
              UTF8String.fromBytes(bytes)
            else bytes)
          }
        case _ => None
      }
      value.map { v =>
        val fn = if (isMin) "min" else "max"
        Compiled(StructField(s"$fn($col)", field.dataType, nullable = true), v)
      }
    }

    def compileAggs(fs: Seq[String]): Option[Seq[Compiled]] = Some(
      agg.aggregateExpressions.toSeq.map {
        case _: CountStar => countStar(fs).getOrElse(return None)
        case f: Count if !f.isDistinct =>
          colOf(f.column).flatMap(countCol(fs, _))
            .getOrElse(return None)
        case f: Min =>
          colOf(f.column).flatMap(minMax(fs, _, isMin = true))
            .getOrElse(return None)
        case f: Max =>
          colOf(f.column).flatMap(minMax(fs, _, isMin = false))
            .getOrElse(return None)
        case _: AggregateFunc => return None
      })

    /** The file's single proven value of a group column: min == max
      * with zero recorded nulls, or all-null (the NULL group). None =
      * impure or unprovable.
      */
    def pureValue(rel: String, col: String): Option[Any] = {
      val field = fileSchema.fields.find(_.name == col).getOrElse {
        return None
      }
      val nulls = fileNulls(rel, col)
      (statOf(rel, col), field.dataType) match {
        case (Some(LongStat(mn, mx)), LongType)
            if mn == mx && nulls.contains(0L) =>
          Some(java.lang.Long.valueOf(mn))
        case (Some(BinStat(mn, mx)), StringType)
            if java.util.Arrays.equals(mn, mx) && nulls.contains(0L) =>
          Some(UTF8String.fromBytes(mn))
        case (None, LongType | StringType) =>
          // all-null file: provable only when nulls == rows
          (nulls, fileRows(rel)) match {
            case (Some(n), Some(r)) if r > 0 && n == r => Some(Null)
            case _ => None
          }
        case _ => None
      }
    }

    if (agg.groupByExpressions.isEmpty) {
      compileAggs(files).map { compiled =>
        (StructType(compiled.map(_.field)),
          Array[InternalRow](
            new GenericInternalRow(compiled.map(_.value).toArray)))
      }
    } else {
      val groupCols = agg.groupByExpressions.toSeq
        .map(colOf(_).getOrElse(return None))
      val groupFields = groupCols.map { c =>
        val f = fileSchema.fields.find(_.name == c).getOrElse(return None)
        StructField(c, f.dataType, nullable = true)
      }
      val keyed: Seq[(Seq[Any], String)] = files.map { f =>
        groupCols.map(c => pureValue(f, c).getOrElse(return None)) -> f
      }
      val rows = keyed.groupBy(_._1).toSeq.map { case (key, members) =>
        val compiled = compileAggs(members.map(_._2)).getOrElse(return None)
        new GenericInternalRow(
          (key.map(unbox) ++ compiled.map(_.value)).toArray)
          : InternalRow
      }
      Some((StructType(groupFields ++ {
        // field list from any group's compiled aggs; zero groups →
        // compile against the empty file set just for the schema
        compileAggs(Nil).getOrElse(return None).map(_.field)
      }), rows.toArray))
    }
  }

  /** Sentinel for the NULL group key (a real null can't live in a
    * Map key path without ambiguity against "absent").
    */
  private case object Null
  private def unbox(v: Any): Any = if (v == Null) null else v
}

/** The metadata answer, planned as a LocalTableScan: zero input
  * partitions, zero file reads — the whole aggregate was the manifest.
  */
case class GraftAggLocalScan(
    aggSchema: StructType, out: Array[InternalRow], tableDesc: String)
    extends LocalScan {
  override def rows(): Array[InternalRow] = out
  override def readSchema(): StructType = aggSchema
  override def description(): String =
    s"$tableDesc (manifest-only aggregate: " +
      s"${aggSchema.fieldNames.mkString(", ")})"
}
