package graft.functions

import scala.collection.mutable
import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass pool-metric aggregator — the scalable variant of SURVEY §2
  * A6 (optional; the built-in two-aggregation path is the golden-parity
  * default).
  *
  * One traversal of the raw win stream produces size/total/hits AND the
  * win histogram (bounded: ~330 distinct wins observed per pool), from
  * which finish() computes rtp, hit frequency and the reference's
  * volatility with bit-identical rounding:
  *   - `bround` ≡ BigDecimal(shortest-repr).setScale(HALF_EVEN) — the
  *     exact semantics of Spark's BRound on doubles, which itself
  *     matches Python round on these value shapes;
  *   - variance terms rounded to 4dp then summed as exact BigDecimal,
  *     so merge order (partial aggregation across executors) cannot
  *     change the result.
  *
  * Compared to the expression pipeline this halves the shuffled volume:
  * partial buffers (histogram maps) combine map-side, and only one
  * shuffle happens instead of histogram + per-file re-aggregation.
  */
object VolatilityAgg {

  case class PoolBuf(
      var bet: Double,
      var haveBet: Boolean,
      counts: mutable.HashMap[Long, Long])

  case class PoolMetricsOut(
      size: Long,
      total_win: Long,
      hits: Long,
      rtp: Option[Double],
      hit_frequency: Option[Double],
      volatility: Option[Double])

  private def bround(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, RoundingMode.HALF_EVEN).toDouble

  /** IN = (game_win, min_bet or null as NaN flag via Option). */
  val agg: Aggregator[(Long, Option[Double]), PoolBuf, PoolMetricsOut] =
    new Aggregator[(Long, Option[Double]), PoolBuf, PoolMetricsOut] {
      def zero: PoolBuf = PoolBuf(0.0, haveBet = false, mutable.HashMap.empty)

      def reduce(b: PoolBuf, in: (Long, Option[Double])): PoolBuf = {
        in._2.foreach { bet => b.bet = bet; b.haveBet = true }
        b.counts.updateWith(in._1) {
          case Some(c) => Some(c + 1L)
          case None => Some(1L)
        }
        b
      }

      def merge(x: PoolBuf, y: PoolBuf): PoolBuf = {
        if (!x.haveBet && y.haveBet) { x.bet = y.bet; x.haveBet = true }
        y.counts.foreach { case (w, c) =>
          x.counts.updateWith(w) {
            case Some(c0) => Some(c0 + c)
            case None => Some(c)
          }
        }
        x
      }

      def finish(b: PoolBuf): PoolMetricsOut = {
        val n = b.counts.valuesIterator.sum
        val total = b.counts.iterator.map { case (w, c) => w * c }.sum
        val hits = b.counts.iterator.collect { case (w, c) if w > 0 => c }.sum
        if (b.haveBet && b.bet > 0 && n > 0) {
          val rtp = bround(total.toDouble / (n * b.bet) * 100.0, 2)
          val hitFreq = bround(hits.toDouble / n * 100.0, 2)
          // round-then-sum: exact decimal accumulation, win order
          // irrelevant because addition of exact decimals commutes
          var varSum = BigDecimal(0)
          b.counts.foreach { case (w, c) =>
            val freq = c.toDouble / n
            val dev = w / b.bet - rtp / 100.0
            varSum += BigDecimal(freq * dev * dev)
              .setScale(4, RoundingMode.HALF_EVEN)
          }
          val vol = bround(1.645 * math.sqrt(varSum.toDouble), 2)
          PoolMetricsOut(n, total, hits, Some(rtp), Some(hitFreq), Some(vol))
        } else PoolMetricsOut(n, total, hits, None, None, None)
      }

      def bufferEncoder: Encoder[PoolBuf] = Encoders.kryo[PoolBuf]
      def outputEncoder: Encoder[PoolMetricsOut] = Encoders.product[PoolMetricsOut]
    }

  /** Untyped-DataFrame handle: `df.groupBy("file").agg(metrics(win, bet))`. */
  def metrics: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(agg,
      Encoders.product[(Long, Option[Double])])
}
