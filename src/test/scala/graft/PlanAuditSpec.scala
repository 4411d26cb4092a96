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
  // n1/n2/r14 broadcast a single row; n5 broadcasts the probe SET —
  // small by contract (the batch being deduped/retrieved-for), with
  // the corpus streaming against it map-side and the per-probe top-k
  // bounded by the TopKAgg aggregation above it.
  private val bnljAllowed = Set("n1_ann_bruteforce", "n2_ann_ivf",
    "r14_scalar_subquery", "n5_knn_join")

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

  test("no query broadcasts an exploded relation") {
    // The d4 bug class, mechanically guarded: size estimation cannot
    // see an explode's blow-up, so a banded/shingled relation (which
    // scales with the corpus) silently rides a BroadcastExchange — a
    // plan that dies at the first real scale-up. Allowlist: x8's
    // benchmark shingle set is exploded AND broadcast on purpose
    // (benchmarks are MBs by contract; the corpus is the probe side).
    // A broadcast whose subtree caps itself with a limit (n2's
    // 2-centroid probe) is bounded no matter what explodes below it.
    // x9 shares x8's intended benchmark-set broadcast (and adds the
    // bloom prefilter so far fewer corpus shingles reach it)
    val allowed = Set("x8_decontaminate", "x9_decontaminate_bloom")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, _) if streaming(name) || allowed(name) => None
        case (name, fn) =>
          val plan = fn(spark, sf0001).queryExecution.executedPlan
          val hit = plan.collect {
            case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
                if b.collect {
                  case g: org.apache.spark.sql.execution.GenerateExec => g
                }.nonEmpty && b.collect {
                  case l: org.apache.spark.sql.execution.BaseLimitExec => l
                  case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
                }.isEmpty => b
          }
          if (hit.nonEmpty) Some(name) else None
      }
      assert(bad.isEmpty,
        s"broadcasting an exploded relation: ${bad.mkString(", ")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
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
