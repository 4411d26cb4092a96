package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Pins the serving-time recall advisory (round-7 verdict, Next #3):
  * the oracle-pinned dial defaults measured recall 0.0 on the
  * CLUSTERED probe corpus, so an IVF/PQ serving query built at
  * default dials over a merged-cell index must raise the advisory —
  * and must stay SILENT on the diffuse probe shape and the oracle
  * testdata (a warning that always fires is noise), and silent again
  * once the user sets the production dials.
  */
class RecallAdvisorySpec extends AnyFunSuite {
  import graft.QueryHarness.spark

  private val work = java.nio.file.Files
    .createTempDirectory("graft_adv").toString
  private val n = 8000L

  test("advisory fires on the clustered shape at default dials only") {
    val clustered = s"$work/clustered"
    graft.tools.ProbeCorpora.write(spark, n, clustered, clustered = true)
    assert(SimilarityQueries.mergedClusterFraction(spark, clustered) >= 0.5)
    assert(SimilarityQueries.maybeWarnRecall(spark, clustered),
      "advisory must fire on a merged-cell index at default dials")
    // a dialed session is presumed tuned — no advisory
    spark.conf.set("graft.ann.nprobe", "4")
    try assert(!SimilarityQueries.maybeWarnRecall(spark, clustered))
    finally spark.conf.unset("graft.ann.nprobe")
  }

  test("advisory is silent on the diffuse shape") {
    val diffuse = s"$work/diffuse"
    graft.tools.ProbeCorpora.write(spark, n, diffuse, clustered = false)
    assert(SimilarityQueries.mergedClusterFraction(spark, diffuse) < 0.5)
    assert(!SimilarityQueries.maybeWarnRecall(spark, diffuse))
  }

  test("advisory is silent on the oracle testdata") {
    val d = graft.QueryHarness.sf001
    assert(SimilarityQueries.mergedClusterFraction(spark, d) < 0.5)
    assert(!SimilarityQueries.maybeWarnRecall(spark, d))
  }
}
