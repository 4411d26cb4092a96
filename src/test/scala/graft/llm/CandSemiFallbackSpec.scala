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
}
