package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.LocalScan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.pol.PoolJsonSink
import graft.pol.PoolJsonSink.{BinStat, LongStat, TableManifest}

/** Metadata-only aggregate answering: `SELECT count(*) / min(c) /
  * max(c) FROM t` resolved from the committed manifest WITHOUT opening
  * a single data file — the Delta/Iceberg "metadata query" pattern,
  * surfaced through DSv2 complete aggregate pushdown.
  *
  * What makes this sound at any table size:
  *  - every staged file records its EXACT row count (`__rows`, a
  *    pseudo zone-map entry written from the parquet footer at commit
  *    time), so `count(*)` is a sum over the manifest;
  *  - zone maps record each file's min/max harvested from the same
  *    footers parquet itself trusts for row-group skipping, and
  *    parquet stats exclude nulls — exactly SQL MIN/MAX semantics;
  *  - coverage is checked per file: ANY live file missing the needed
  *    stat (older writer, all-null column in that file, oversized
  *    binary value) fails the compile and the query falls back to the
  *    ordinary scan. Conservative, never a guess.
  *
  * Only complete, ungrouped pushdown is attempted, and Spark only
  * offers it when no residual filter sits between the Aggregate and
  * the scan — so a filtered aggregate always takes the data path.
  * Supported value types are the ones whose manifest stats are
  * bit-faithful to the Catalyst internal value: LONG columns
  * (LongStat is the raw INT64 footer stat) and STRING/BINARY columns
  * (BinStat's unsigned-lexicographic byte order IS UTF8String/binary
  * sort order). Timestamps are deliberately excluded: their footer
  * stat unit depends on the writer's outputTimestampType conf, and a
  * millis-written table would silently misreport micros.
  */
object GraftMetaAgg {

  /** One compiled output column: SQL-facing field + the internal
    * value (boxed Long / UTF8String / Array[Byte] / null).
    */
  private case class Compiled(field: StructField, value: Any)

  /** Compile a pushed aggregation against the manifest, or None when
    * any piece is unanswerable from metadata alone.
    */
  def compile(
      m: TableManifest, fileSchema: StructType,
      agg: Aggregation): Option[(StructType, InternalRow)] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val files = m.files
    def statOf(rel: String, c: String): Option[PoolJsonSink.ColStat] =
      m.stats.get(rel).flatMap(_.get(c))

    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        Some(r.fieldNames.head)
      case _ => None
    }

    def countStar: Option[Compiled] = {
      val counts = files.map(f => statOf(f, PoolJsonSink.RowsStatCol)
        .collect { case LongStat(n, _) => n })
      if (counts.exists(_.isEmpty)) None
      else Some(Compiled(
        StructField("count(*)", LongType, nullable = false),
        java.lang.Long.valueOf(counts.flatten.sum)))
    }

    def minMax(col: String, isMin: Boolean): Option[Compiled] = {
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
          val ss = files.map(f => statOf(f, col).collect {
            case LongStat(mn, mx) => if (isMin) mn else mx
          })
          if (ss.exists(_.isEmpty)) return None
          if (ss.isEmpty) Some(null)
          else Some(java.lang.Long.valueOf(ss.flatten.reduce(pick)))
        case StringType | BinaryType =>
          val ss = files.map(f => statOf(f, col).collect {
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

    val compiled: Seq[Compiled] =
      agg.aggregateExpressions.toSeq.map {
        case _: CountStar => countStar.getOrElse(return None)
        case f: Min =>
          colOf(f.column).flatMap(minMax(_, isMin = true))
            .getOrElse(return None)
        case f: Max =>
          colOf(f.column).flatMap(minMax(_, isMin = false))
            .getOrElse(return None)
        case _: AggregateFunc => return None
      }

    Some((StructType(compiled.map(_.field)),
      new GenericInternalRow(compiled.map(_.value).toArray)))
  }
}

/** The one-row answer, planned as a LocalTableScan: zero input
  * partitions, zero file reads — the whole aggregate was the manifest.
  */
case class GraftAggLocalScan(
    aggSchema: StructType, row: InternalRow, tableDesc: String)
    extends LocalScan {
  override def rows(): Array[InternalRow] = Array(row)
  override def readSchema(): StructType = aggSchema
  override def description(): String =
    s"$tableDesc (manifest-only aggregate: " +
      s"${aggSchema.fieldNames.mkString(", ")})"
}
