package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The dedup-family recall advisory (round-9 verdict items 1–2): the
  * LSH hot-bucket cap trades recall for bounded cost, and the
  * D15CountProbe census measured that trade silently cutting planted
  * near-dup recall 44% → 26% on a 4× corpus step. The advisory makes
  * the silent regime loud — it must fire on a saturated corpus at
  * default dials, stay silent on healthy testdata, stay silent when
  * the operator has already dialed, and NAME a computed re-dial —
  * the LARGEST cap whose kept buckets emit ≤ PairBudgetPerRow
  * candidate pairs per banded row (the linear pair envelope; the
  * earlier ≥99%-of-rows-mass rule was retired as cost-blind by
  * OccCurveProbe's measurements) — rather than telling the operator
  * to go measure.
  */
class DedupRecallAdvisorySpec extends AnyFunSuite {
  import graft.QueryHarness._

  /** A saturated fixture: `nGroups` groups of `width` byte-identical
    * docs (each group's 4 band buckets have exactly `width` rows —
    * over the default cap) plus `nDistinct` unique docs (width-1
    * buckets).
    */
  private def saturatedCorpus(
      nGroups: Int, width: Int, nDistinct: Int): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dedup_adv_").toString
    import spark.implicits._
    val dup = (0 until nGroups * width).map { i =>
      val g = i / width
      // tokens carry g everywhere: groups share NO 8-char shingles,
      // so each group's 4 band buckets hold exactly `width` rows
      val text = (0 until 12).map(k => s"wave${g}tok${k}g$g").mkString(" ")
      (i.toLong, text, "en", s"srcdup$g", 100L)
    }
    val uniq = (0 until nDistinct).map { i =>
      val text = (0 until 12).map(k => s"uniq${i}tok${k}u$i").mkString(" ")
      (nGroups * width + i.toLong, text, "en", s"src$i", 90L)
    }
    (dup ++ uniq).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("advisory fires on a saturated corpus and names a cost-aware re-dial") {
    val dir = saturatedCorpus(nGroups = 30, width = 4, nDistinct = 10)
    assert(DedupQueries.maybeWarnDedupRecall(spark, dir),
      "width-4 duplicate groups put >70% of banded rows over the " +
        "default cap — the advisory condition must hold")
    val occ = DedupQueries.lshOccupancy(spark, dir)
    // 30 groups × 4 docs × 4 bands = 480 shed rows vs 40 kept ones
    assert(occ.shedFraction > 0.7, s"shed=${occ.shedFraction}")
    // the computed re-dial: admitting the width-4 buckets costs
    // 30 groups × 4 bands × C(4,2)=6 = 720 pairs ≤ 2 × 520 rows —
    // inside the linear envelope, so the recommendation is cap=4
    assert(occ.capRec == 4L, s"capRec=${occ.capRec}")
    assert(occ.maxWidth == 4L)
  }

  test("cost guard: a degenerate boilerplate blob is NOT recommended a bigger cap") {
    // 60 byte-identical docs: admitting their buckets would cost
    // 4 × C(60,2) = 7,080 pairs over 280 banded rows — far past the
    // linear envelope, so capRec stays at the default and the
    // advisory's alternate branch (exact pre-pass / re-band) applies
    val dir = saturatedCorpus(nGroups = 1, width = 60, nDistinct = 10)
    assert(DedupQueries.maybeWarnDedupRecall(spark, dir))
    val occ = DedupQueries.lshOccupancy(spark, dir)
    assert(occ.shedFraction > 0.8, s"shed=${occ.shedFraction}")
    assert(occ.capRec == 2L, s"capRec=${occ.capRec}")
  }

  test("advisory is silent on healthy testdata at default dials") {
    // sf0.001/sf0.01 shed 0.8–1.4% at the default cap — an order of
    // magnitude under the threshold (healthy LSH blocking)
    assert(!DedupQueries.maybeWarnDedupRecall(spark, sf0001))
    assert(!DedupQueries.maybeWarnDedupRecall(spark, sf001))
    assert(DedupQueries.lshOccupancy(spark, sf001).shedFraction < 0.05)
  }

  test("advisory is silent when the operator has dialed the cap") {
    val dir = saturatedCorpus(nGroups = 30, width = 4, nDistinct = 10)
    spark.conf.set("graft.dedup.bucket_cap", "64")
    try assert(!DedupQueries.maybeWarnDedupRecall(spark, dir),
      "a dialed session owns its recall/cost trade — no advisory")
    finally spark.conf.unset("graft.dedup.bucket_cap")
  }

  test("the bucket-cap dial actually changes d7's candidate set") {
    val dir = saturatedCorpus(nGroups = 2, width = 4, nDistinct = 4)
    val atDefault = graft.SparkEntry
      .queries("d7_lsh_bucket_cap")(spark, dir).count()
    // default cap 2 sheds the width-4 duplicate buckets entirely
    assert(atDefault == 0L, s"default-cap pairs=$atDefault")
    spark.conf.set("graft.dedup.bucket_cap", "4")
    try {
      val dialed = graft.SparkEntry
        .queries("d7_lsh_bucket_cap")(spark, dir).count()
      // at the computed re-dial the 2 groups yield their
      // 2 × C(4,2) = 12 candidate pairs — the recall the default shed
      assert(dialed == 12L, s"dialed pairs=$dialed")
    } finally spark.conf.unset("graft.dedup.bucket_cap")
  }

  test("the rows-per-band dial re-bands and keeps identical-doc groups intact") {
    // r=8 → 2 bands of 8 rows
    val bs = DedupQueries.sigsWithBuckets(spark, sf0001, r = 8)
      .select(size(col("bs"))).head().getInt(0)
    assert(bs == 2)
    // identical docs share every minhash, so they bucket together
    // under ANY banding: the group fixture still yields its pairs
    val dir = saturatedCorpus(nGroups = 2, width = 4, nDistinct = 4)
    spark.conf.set("graft.dedup.rows_per_band", "8")
    spark.conf.set("graft.dedup.bucket_cap", "4")
    try {
      val pairs = graft.SparkEntry
        .queries("d7_lsh_bucket_cap")(spark, dir).count()
      assert(pairs == 12L, s"re-banded pairs=$pairs")
    } finally {
      spark.conf.unset("graft.dedup.rows_per_band")
      spark.conf.unset("graft.dedup.bucket_cap")
    }
  }

  test("the num_perms dial widens signatures and adds bands") {
    spark.conf.set("graft.dedup.num_perms", "32")
    try {
      // d2's signature string carries 32 '_'-joined minima
      val sig = graft.SparkEntry.queries("d2_minhash_signatures")(
        spark, sf0001).head().getAs[String]("sig")
      assert(sig.split('_').length == 32)
      // default 4 rows/band over 32 perms = 8 bands
      val bs = DedupQueries.sigsWithBuckets(spark, sf0001)
        .select(size(col("bs"))).head().getInt(0)
      assert(bs == 8)
      // identical docs share every minhash under any K: the group
      // fixture still yields its pairs through d7 at the dialed cap
      val dir = saturatedCorpus(nGroups = 2, width = 4, nDistinct = 4)
      spark.conf.set("graft.dedup.bucket_cap", "4")
      try {
        val pairs = graft.SparkEntry
          .queries("d7_lsh_bucket_cap")(spark, dir).count()
        assert(pairs == 12L, s"K=32 pairs=$pairs")
      } finally spark.conf.unset("graft.dedup.bucket_cap")
    } finally spark.conf.unset("graft.dedup.num_perms")
  }

  test("advisory is silent when the operator has raised num_perms") {
    val dir = saturatedCorpus(nGroups = 30, width = 4, nDistinct = 10)
    spark.conf.set("graft.dedup.num_perms", "32")
    try assert(!DedupQueries.maybeWarnDedupRecall(spark, dir))
    finally spark.conf.unset("graft.dedup.num_perms")
  }

  test("advisory is silent when the operator has re-banded") {
    val dir = saturatedCorpus(nGroups = 30, width = 4, nDistinct = 10)
    spark.conf.set("graft.dedup.rows_per_band", "8")
    try assert(!DedupQueries.maybeWarnDedupRecall(spark, dir))
    finally spark.conf.unset("graft.dedup.rows_per_band")
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
