package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-3 catalog additions: Gopher
  * filter rules (x10), duplicate-span mining (x11), vocabulary build
  * (x12), event rolling analytics (w2), and distribution summaries
  * (r20). The DuckDB oracle pins exact values; these tests pin the
  * properties a user relies on (bounds, monotonicity, internal
  * consistency) so a future plan rewrite can't silently bend them.
  */
class CorpusOpsSpec extends AnyFunSuite {
  import QueryHarness._

  test("x10 features are consistent with the pass flag") {
    val rows = SparkEntry.queries("x10_gopher_rules")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nToks = r.getAs[Int]("n_toks")
      val mean = r.getAs[Double]("mean_tok_len")
      val alpha = r.getAs[Double]("alpha_frac")
      val nStop = r.getAs[Int]("n_req_stop")
      val expected = nToks >= 30 && nToks <= 100000 &&
        mean >= 3 && mean <= 10 && alpha >= 0.8 && nStop >= 2
      assert(r.getAs[Int]("pass") == (if (expected) 1 else 0),
        s"pass flag disagrees with features: $r")
      assert(alpha >= 0 && alpha <= 1)
    }
    // the rule set must actually discriminate on the test corpus
    val passed = rows.count(_.getAs[Int]("pass") == 1)
    assert(passed > 0 && passed < rows.length,
      s"rules vacuous: $passed/${rows.length} pass")
  }

  test("x11 shared-span counts are bounded and non-trivial") {
    val rows = SparkEntry.queries("x11_dup_spans")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nSpans = r.getAs[Long]("n_spans")
      val nShared = r.getAs[Long]("n_shared")
      val frac = r.getAs[Double]("shared_frac")
      assert(nShared >= 0 && nShared <= nSpans, s"count out of bounds: $r")
      assert(frac >= 0 && frac <= 1)
    }
    // a shared span needs at least TWO docs carrying it: the global
    // number of docs with any shared span can't be exactly one
    assert(rows.count(_.getAs[Long]("n_shared") > 0) != 1)
  }

  test("x12 ids are contiguous, frequencies sorted, coverage monotone to 1e6") {
    val rows = SparkEntry.queries("x12_vocab_build")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("token_id") == i.toLong, s"id gap at $i")
    }
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "freqs not desc")
    val ppm = rows.map(_.getAs[Long]("cum_ppm"))
    assert(ppm.zip(ppm.tail).forall { case (a, b) => a <= b }, "coverage not monotone")
    assert(ppm.last == 1000000L, s"final coverage ${ppm.last}")
  }

  test("w2 gaps are non-negative and lag/lead agree with per-user order") {
    val df = SparkEntry.queries("w2_event_rolling")(spark, sf001)
    assert(df.where(col("gap_us") < 0).count() == 0)
    // exactly one window-start (null prev AND null gap together) per user
    val users = Tables.events(spark, sf001).select("user_id").distinct().count()
    assert(df.where(col("prev_value").isNull !== col("gap_us").isNull).count() == 0)
    assert(df.where(col("prev_value").isNull).count() == users)
    // moving sum over positive values dominates any single value
    assert(df.where(col("mov_sum") <= 0).count() == 0)
  }

  test("r20 percentiles are ordered and the sketch stays in tolerance") {
    val rows = SparkEntry.queries("r20_percentiles")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getAs[Double]("p50"), r.getAs[Double]("p90"),
        r.getAs[Double]("p99"))
      assert(p50 <= p90 && p90 <= p99, s"percentiles out of order: $r")
      assert(r.getAs[Boolean]("approx_within_tol"), s"sketch off: $r")
    }
  }
}
