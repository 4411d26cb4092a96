package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k by an ordering key — the scale-safe engine
  * behind c3_quota_sample (and any "k rows per group by rank" shape).
  *
  * The naive formulation is `row_number().over(Window.partitionBy(g)
  * .orderBy(key))` + filter, which sorts an ENTIRE group inside one
  * task: on a Zipfian source mix at 100 TB (one crawl dominating) that
  * is a single-task sort — an executor OOM or a straggler that decides
  * the job's wall-clock. This aggregator keeps at most k (key, id)
  * entries per group per task, partials combine map-side, and the
  * shuffle carries k·|groups| tuples no matter how skewed the groups
  * are. Memory per group is O(k); nothing sorts more than 4k elements
  * at a time.
  *
  * Determinism: entries order by (key, id) — the same (md5-rank,
  * doc_id) tiebreak the window formulation used — and String ordering
  * on the lowercase-hex keys is identical across Scala (UTF-16
  * compareTo), Spark (UTF8String bytes) and DuckDB (varchar), all
  * plain ASCII comparisons here.
  */
object TopKAgg {

  case class Buf(items: mutable.ArrayBuffer[(String, Long)])
  case class TopOut(ids: Seq[Long])

  def topKByKey(k: Int): Aggregator[(String, Long), Buf, TopOut] =
    new Aggregator[(String, Long), Buf, TopOut] {
      private val ord =
        Ordering.Tuple2[String, Long](Ordering.String, Ordering.Long)

      private def trim(b: Buf): Buf = {
        if (b.items.length > k) {
          val kept = b.items.sorted(ord).take(k)
          b.items.clear()
          b.items ++= kept
        }
        b
      }

      def zero: Buf = Buf(mutable.ArrayBuffer.empty)

      // amortize the sort: let the buffer grow to 4k before trimming
      def reduce(b: Buf, in: (String, Long)): Buf = {
        b.items += in
        if (b.items.length >= 4 * k) trim(b) else b
      }

      def merge(x: Buf, y: Buf): Buf = { x.items ++= y.items; trim(x) }

      def finish(b: Buf): TopOut =
        TopOut(b.items.sorted(ord).take(k).map(_._2).toSeq)

      def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      def outputEncoder: Encoder[TopOut] = Encoders.product[TopOut]
    }

  /** DataFrame handle: `df.groupBy(g).agg(topDocs(k)(keyCol, idCol))`
    * yields a struct with `ids`: the k ids in (key, id) rank order.
    */
  def topDocs(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(topKByKey(k),
      Encoders.product[(String, Long)])

  /** One scored neighbor: id plus the score that ranked it. */
  case class Hit(id: Long, score: Double)
  case class SBuf(items: mutable.ArrayBuffer[(Double, Long)])
  case class ScoredOut(items: Seq[Hit])

  /** Bounded per-group top-k by DESCENDING score (ties → smaller id) —
    * the k-NN-join shape: per probe, keep the k best-scoring neighbors.
    * Same partial-aggregation mechanics as [[topKByKey]]: each task
    * holds ≤4k entries per group, partials combine map-side, the
    * shuffle carries k·|groups| tuples regardless of corpus skew — vs
    * the window formulation that sorts every candidate row of a probe
    * in one task. Scores must be pre-rounded upstream if cross-engine
    * rank stability is required (doubles compare exactly after both
    * engines round to the same decimals).
    */
  def topKByScore(k: Int): Aggregator[(Double, Long), SBuf, ScoredOut] =
    new Aggregator[(Double, Long), SBuf, ScoredOut] {
      // descending score, ascending id — NaN-free by construction
      // (cosines of non-zero vectors), so Double.TotalOrdering's NaN
      // placement never engages
      private val ord = Ordering.by[(Double, Long), (Double, Long)] {
        case (s, id) => (-s, id)
      }(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))

      private def trim(b: SBuf): SBuf = {
        if (b.items.length > k) {
          val kept = b.items.sorted(ord).take(k)
          b.items.clear()
          b.items ++= kept
        }
        b
      }

      def zero: SBuf = SBuf(mutable.ArrayBuffer.empty)

      def reduce(b: SBuf, in: (Double, Long)): SBuf = {
        b.items += in
        if (b.items.length >= 4 * k) trim(b) else b
      }

      def merge(x: SBuf, y: SBuf): SBuf = { x.items ++= y.items; trim(x) }

      def finish(b: SBuf): ScoredOut =
        ScoredOut(b.items.sorted(ord).take(k)
          .map { case (s, id) => Hit(id, s) }.toSeq)

      def bufferEncoder: Encoder[SBuf] = Encoders.kryo[SBuf]
      def outputEncoder: Encoder[ScoredOut] = Encoders.product[ScoredOut]
    }

  /** `df.groupBy(g).agg(topNeighbors(k)(scoreCol, idCol))` → struct
    * with `items`: k (id, score) hits in (score desc, id) rank order.
    */
  def topNeighbors(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(topKByScore(k),
      Encoders.product[(Double, Long)])
}
