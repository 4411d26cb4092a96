package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The dedup-family recall advisory (round-9 verdict items 1–2): the
  * LSH hot-bucket cap trades recall for bounded cost, and the
  * D15CountProbe census measured that trade silently cutting planted
  * near-dup recall 44% → 26% on a 4× corpus step. The advisory makes
  * the silent regime loud — it must fire on a saturated corpus at
  * default dials, stay silent on healthy testdata, stay silent when
  * the operator has already dialed, and NAME a computed re-dial
  * (smallest cap keeping ≥99% of banded rows) rather than telling the
  * operator to go measure.
  */
class DedupRecallAdvisorySpec extends AnyFunSuite {
  import graft.QueryHarness._

  /** A saturated fixture: `nDup` byte-identical docs (every band
    * signature equal → 4 buckets of width nDup, all over the default
    * cap) plus `nDistinct` unique docs (width-1 buckets).
    */
  private def saturatedCorpus(nDup: Int, nDistinct: Int): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dedup_adv_").toString
    import spark.implicits._
    val dup = (0 until nDup).map(i =>
      (i.toLong, "the same boilerplate page body repeated verbatim " +
        "across the crawl wave with zero variation at all", "en",
        "srcdup", 100L))
    val uniq = (0 until nDistinct).map(i =>
      (nDup + i.toLong, s"unique document number $i with its own " +
        s"content hash${i * 7919} and token mix${i * 104729}", "en",
        s"src$i", 90L))
    (dup ++ uniq).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("advisory fires on a saturated corpus at default dials") {
    val dir = saturatedCorpus(nDup = 50, nDistinct = 10)
    assert(DedupQueries.maybeWarnDedupRecall(spark, dir),
      "50 identical docs put >80% of banded rows over the default " +
        "cap — the advisory condition must hold")
    val occ = DedupQueries.lshOccupancy(spark, dir)
    // 50 identical docs → 4 buckets of width 50 (200 rows shed) vs 10
    // unique docs × 4 width-1 buckets (40 rows kept): shed ≈ 83%
    assert(occ.shedFraction > 0.8, s"shed=${occ.shedFraction}")
    // the computed re-dial: 99% of rows need the width-50 buckets
    assert(occ.capRec == 50L, s"capRec=${occ.capRec}")
    assert(occ.maxWidth == 50L)
  }

  test("advisory is silent on healthy testdata at default dials") {
    // sf0.001/sf0.01 shed 0.8–1.4% at the default cap — an order of
    // magnitude under the threshold (healthy LSH blocking)
    assert(!DedupQueries.maybeWarnDedupRecall(spark, sf0001))
    assert(!DedupQueries.maybeWarnDedupRecall(spark, sf001))
    assert(DedupQueries.lshOccupancy(spark, sf001).shedFraction < 0.05)
  }

  test("advisory is silent when the operator has dialed the cap") {
    val dir = saturatedCorpus(nDup = 50, nDistinct = 10)
    spark.conf.set("graft.dedup.bucket_cap", "64")
    try assert(!DedupQueries.maybeWarnDedupRecall(spark, dir),
      "a dialed session owns its recall/cost trade — no advisory")
    finally spark.conf.unset("graft.dedup.bucket_cap")
  }

  test("the bucket-cap dial actually changes d7's candidate set") {
    val dir = saturatedCorpus(nDup = 8, nDistinct = 4)
    val atDefault = graft.SparkEntry
      .queries("d7_lsh_bucket_cap")(spark, dir).count()
    // default cap 2 sheds the width-8 duplicate buckets entirely
    assert(atDefault == 0L, s"default-cap pairs=$atDefault")
    spark.conf.set("graft.dedup.bucket_cap", "64")
    try {
      val dialed = graft.SparkEntry
        .queries("d7_lsh_bucket_cap")(spark, dir).count()
      // at the recommended-style re-dial the 8 identical docs yield
      // their C(8,2)=28 candidate pairs — the recall the default shed
      assert(dialed == 28L, s"dialed pairs=$dialed")
    } finally spark.conf.unset("graft.dedup.bucket_cap")
  }

  test("occupancy sidecar round-trips and caches") {
    val occ1 = DedupQueries.lshOccupancy(spark, sf0001)
    val occ2 = DedupQueries.lshOccupancy(spark, sf0001)
    assert(occ1 == occ2)
    assert(occ1.totalRows > 0 && occ1.nBuckets > 0)
    assert(occ1.capRec >= 2L)
  }

  test("d16's recall eval is wired into the catalog with an oracle") {
    assert(graft.SparkEntry.queries.contains("d16_dedup_recall"))
    assert(graft.SparkEntry.oracleSql.contains("d16_dedup_recall"))
    val row = graft.SparkEntry
      .queries("d16_dedup_recall")(spark, sf0001).head()
    val nTrue = row.getAs[Long]("n_true")
    val nHit = row.getAs[Long]("n_hit")
    assert(nTrue > 0, "testdata must contain probe-sample truth pairs")
    assert(nHit <= nTrue)
    assert(math.abs(row.getAs[Double]("recall") -
      math.round(nHit.toDouble / nTrue * 10000) / 10000.0) < 1e-9)
  }
}
