package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

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

  test("m7 corpus side reads codes only; no text file in the serving plan") {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = exec().queryExecution.executedPlan
      // collectWithSubqueries: scans can land inside the corpus
      // scan's dynamic-partition-pruning subquery, where plain
      // collect cannot see them
      val scans = plan.collectWithSubqueries {
        case f: FileSourceScanExec => f
      }
      val idx = scans.filter(_.metadata.get("Location")
        .exists(_.contains("graft_ivfpq2_trained")))
      assert(idx.nonEmpty, "no trained-PQ-index scan in the m7 plan")
      val readSchema = idx.head.metadata("ReadSchema")
      assert(readSchema.contains("codes") && !readSchema.contains("e:"),
        s"cross-modal serving must read codes only, got: $readSchema")
      // the text-probe side materializes (budget-bounded, ≤500 rows)
      // BEFORE serving: the serving plan itself must touch no
      // documents file — its only file scans are the trained index
      val docs = scans.filter(_.metadata.get("Location")
        .exists(_.contains("documents")))
      assert(docs.isEmpty,
        "serving plan must read the materialized probe relation, " +
          "not the documents files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("m7 probe relation is budget-bounded with the predicate pushed") {
    // the pre-materialization probe subplan (documents → budget filter
    // → encoder projection) is where the budget predicate must reach
    // the scan; pin it on the subplan directly since the serving plan
    // sees only the checkpointed result
    val probes = graft.Tables.documents(spark, sf0001)
      .where(col("doc_id") % 10 === 0 && col("doc_id") < 5000)
      .select(col("doc_id"))
    val scans = probes.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("LessThan(doc_id,5000)"),
      s"probe budget must reach the documents scan, got: $pushed")
    assert(probes.count() <= 500)
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

  test("t13 streamed serving equals batch m7 row-for-row") {
    // per-probe top-k is independent and hash staging puts each probe
    // in exactly one micro-batch, so the streamed union must be
    // IDENTICAL to one-shot batch serving — the t-family's core
    // micro-batch-order-invariance contract, pinned engine-side
    // (the shared DuckDB oracle pins it against first principles)
    val streamed = graft.SparkEntry
      .queries("t13_stream_crossmodal_serving")(spark, sf0001)
      .selectExpr("probe_id", "rk", "vec_id", "ad2").collect().toSeq
    val batch = graft.SparkEntry
      .queries("m7_crossmodal_retrieval")(spark, sf0001)
      .selectExpr("probe_id", "rk", "vec_id", "ad2").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
