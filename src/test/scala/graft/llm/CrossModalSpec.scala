package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.QueryHarness._

/** m7 cross-modal retrieval: the semantics are oracle-gated (DuckDB
  * replays the text encoder + routing + residual-ADC chain); these
  * tests pin the PLAN properties that make it the 100 TB serving
  * shape — the corpus side must read PQ codes only (never a float
  * embedding), the probe-budget predicate must reach the documents
  * scan, and the output must be a bounded per-probe top-10.
  */
class CrossModalSpec extends AnyFunSuite {
  import spark.implicits._

  private def exec() =
    graft.SparkEntry.queries("m7_crossmodal_retrieval")(spark, sf0001)

  test("m7 corpus side reads codes only; probe budget reaches the scan") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = exec().queryExecution.executedPlan
      // collectWithSubqueries: the probe subtree can land inside the
      // corpus scan's dynamic-partition-pruning subquery (its twin in
      // the main plan then being a ReusedExchange), where plain
      // collect cannot see it
      val scans = plan.collectWithSubqueries {
        case f: FileSourceScanExec => f
      }
      val idx = scans.filter(_.metadata.get("Location")
        .exists(_.contains("graft_ivfpq2_trained")))
      assert(idx.nonEmpty, "no trained-PQ-index scan in the m7 plan")
      val readSchema = idx.head.metadata("ReadSchema")
      assert(readSchema.contains("codes") && !readSchema.contains("e:"),
        s"cross-modal serving must read codes only, got: $readSchema")
      // the text-probe side: the budget predicate (doc_id < 5000) must
      // push to the documents scan so the probe relation stays bounded
      // by ROW-GROUP pruning at any corpus size
      val docs = scans.filter(_.metadata.get("Location")
        .exists(_.contains("documents")))
      assert(docs.nonEmpty, "no documents scan in the m7 plan")
      val pushed = docs.head.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("LessThan(doc_id,5000)"),
        s"probe budget must reach the documents scan, got: $pushed")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("m7 returns a dense per-probe top-10 with nonnegative ad2") {
    val rows = exec()
      .selectExpr("probe_id", "rk", "vec_id", "ad2")
      .as[(Long, Int, Long, Double)].collect()
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.nonEmpty)
    byProbe.foreach { case (p, rs) =>
      assert(rs.length == 10, s"probe $p: expected 10 rows")
      assert(rs.map(_._2).sorted.toSeq == (1 to 10),
        s"probe $p: ranks must be dense 1..10")
      val sorted = rs.sortBy(_._2)
      // rank order is (ad2 asc, vec_id asc) — the oracle's tie-break
      assert(sorted.map(x => (x._4, x._3)).toSeq ==
        sorted.map(x => (x._4, x._3)).sortBy(identity).toSeq,
        s"probe $p: rows must be ordered by (ad2, vec_id)")
      assert(rs.forall(_._4 >= 0.0), s"probe $p: ad2 must be >= 0")
    }
    // every gated doc encodes to a probe: %10 under the budget
    assert(byProbe.keySet.forall(p => p % 10 == 0 && p < 5000))
  }
}
