package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness._

/** The over-cap candidate-semi path (bloom prefilter + exact shuffle
  * semi) must return byte-identical rows to the broadcast path — the
  * strategy switch is a COST decision, never a semantic one. Driven by
  * forcing the cap to 1 via the session conf, so both d8 (jaccard
  * verify) and d15 (edit-distance verify) take the bloom fallback on
  * the test corpus.
  */
class CandSemiFallbackSpec extends AnyFunSuite {

  private def rows(name: String): Seq[String] =
    graft.SparkEntry.queries(name)(spark, sf0001)
      .collect().map(_.toString).toSeq

  for (q <- Seq("d8_jaccard_verify", "d15_lsh_lev_verify")) {
    test(s"$q: bloom-fallback semi ≡ broadcast semi") {
      val broadcastRows = rows(q)
      spark.conf.set("graft.dedup.cand_broadcast_cap", "1")
      try {
        val bloomRows = rows(q)
        assert(bloomRows == broadcastRows,
          s"$q rows diverge between semi strategies")
      } finally spark.conf.unset("graft.dedup.cand_broadcast_cap")
    }
  }

  test("over-cap path actually plans the bloom prefilter") {
    // value-equality alone would pass a fallback that silently
    // reverted to the bare shuffle semi (the 204-248 s shape at 16M);
    // pin that the over-cap plan carries might_contain
    spark.conf.set("graft.dedup.cand_broadcast_cap", "1")
    try {
      val plan = graft.SparkEntry
        .queries("d8_jaccard_verify")(spark, sf0001)
        .queryExecution.executedPlan
      assert(plan.toString.contains("might_contain"),
        "over-cap candSemi must plan the bloom prefilter")
    } finally spark.conf.unset("graft.dedup.cand_broadcast_cap")
  }

  test("bloom build restores the session's runtime-bloom confs") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
    val before = keys.map(spark.conf.get(_))
    spark.conf.set("graft.dedup.cand_broadcast_cap", "1")
    try rows("d15_lsh_lev_verify")
    finally spark.conf.unset("graft.dedup.cand_broadcast_cap")
    assert(keys.map(spark.conf.get(_)) == before,
      "candSemi's sketch build leaked raised bloom-size confs")
  }
}
