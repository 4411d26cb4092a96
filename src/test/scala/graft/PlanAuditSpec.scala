package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide physical-plan audit: no query may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin is allowed only on
  * the allowlist where the broadcast side is a single row and 1×N is
  * the intended plan (ANN probe vectors, scalar subquery). Guards
  * against a future query (or Spark upgrade) silently regressing into
  * a quadratic join that cannot survive scale-up.
  *
  * Streaming queries execute on plan inspection, so only batch queries
  * are audited — their streaming plans are pinned by their own specs.
  */
class PlanAuditSpec extends AnyFunSuite {
  import QueryHarness._

  private val streaming = Set("t1_stream_agg", "t2_stream_window",
    "t4_stream_stream_join", "t5_stream_dedup")
  private val bnljAllowed = Set("n1_ann_bruteforce", "n2_ann_ivf",
    "r14_scalar_subquery")

  test("no catalog query plans a cartesian product or stray BNLJ") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if streaming(name) => None
      case (name, fn) =>
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          Some(s"$name: CartesianProduct")
        else if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
          Some(s"$name: BroadcastNestedLoopJoin off-allowlist")
        else None
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("c3_quota_sample plans no window over an unbounded partition") {
    // the r2 scale-killer: row_number().over(partitionBy(source)) sorts
    // a whole source inside one task. The bounded top-k aggregator must
    // keep the plan window-free.
    val plan = SparkEntry.queries("c3_quota_sample")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "c3 must use the bounded top-k aggregator, not a window sort")
  }
}
