package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.{spark, sf0001}

/** The end-to-end curation CLI: one job composing gate → dedup →
  * decontaminate → split → keyed-table MERGE. The spec pins the
  * invariants a platform depends on: the table content equals the
  * report, quarantine/benchmark exclusion holds, exact duplicates
  * cannot co-exist in the output, and a re-run is a clean idempotent
  * MERGE (new committed version, identical content).
  */
class CurateMainSpec extends AnyFunSuite {
  import spark.implicits._

  private lazy val out = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_curate_spec").toString
    CurateMain.run(spark, sf0001, dir) -> dir
  }

  test("table content equals the report accounting") {
    val (report, dir) = out
    val table = graft.pol.PoolJsonSink.readTable(spark, s"$dir/table")
    val fromTable = table.groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_toks"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(fromTable == report.toSet)
    assert(report.map(_._3).sum == table.count())
  }

  test("no exact duplicate texts and no benchmark docs survive") {
    val (_, dir) = out
    val table = graft.pol.PoolJsonSink.readTable(spark, s"$dir/table")
    val n = table.count()
    assert(n > 0)
    assert(table.select(md5(col("text"))).distinct().count() == n,
      "exact duplicates must not co-exist in the curated corpus")
    assert(table.where(col("doc_id") % 97 === 0 &&
      col("doc_id") < TextQueries.BenchBudget).isEmpty,
      "benchmark docs are eval data, never corpus rows")
  }

  test("contaminated docs are quarantined, not in train/val/test") {
    val (_, dir) = out
    val table = graft.pol.PoolJsonSink.readTable(spark, s"$dir/table")
    val verdict = TextQueries.queries("x8_decontaminate")(spark, sf0001)
      .where(col("contaminated") === 1).select("doc_id")
    val leaked = table
      .join(verdict, Seq("doc_id"), "left_semi")
      .where(col("split") =!= "quarantined")
    assert(leaked.isEmpty, "contaminated rows leaked into a split")
  }

  test("re-running the job is an idempotent MERGE: new version, " +
    "identical content") {
    val (report, dir) = out
    val v1 = graft.pol.PoolJsonSink.listVersions(s"$dir/table").last
    val report2 = CurateMain.run(spark, sf0001, dir)
    val v2 = graft.pol.PoolJsonSink.listVersions(s"$dir/table").last
    assert(v2 > v1, "a re-run commits a new version")
    assert(report2 == report, "a re-run over the same corpus changes nothing")
    val t1 = graft.pol.PoolJsonSink
      .readTableAsOf(spark, s"$dir/table", v1)
      .orderBy("doc_id").select("doc_id", "split", "n_toks")
      .as[(Long, String, Long)].collect().toSeq
    val t2 = graft.pol.PoolJsonSink.readTable(spark, s"$dir/table")
      .orderBy("doc_id").select("doc_id", "split", "n_toks")
      .as[(Long, String, Long)].collect().toSeq
    assert(t1 == t2)
  }
}
