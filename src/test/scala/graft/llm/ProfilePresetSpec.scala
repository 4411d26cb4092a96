package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** The `graft.dedup.profile=recall` preset (round-11 verdict item 2):
  * the measured recall-ladder point (num_perms=32 at rows_per_band=8,
  * engine-validated 0.966/0.960 planted recall at 4M/16M) behind ONE
  * conf — because the two dials are only sound together (k=32 at the
  * default r=4 measured WORSE than defaults: 0.44 vs the 0.44–0.68
  * band, SCALING.md round 11). The preset must resolve to exactly the
  * two dials (bit-equal pair sets), reject a CONFLICTING explicit
  * dial loudly instead of silently picking one, and count as "dialed"
  * for the recall advisory.
  */
class ProfilePresetSpec extends AnyFunSuite {
  import graft.QueryHarness._

  private def unsetAll(): Unit = Seq(
    "graft.dedup.profile", "graft.dedup.num_perms",
    "graft.dedup.rows_per_band").foreach(spark.conf.unset)

  test("profile=recall resolves to the measured dial point") {
    spark.conf.set("graft.dedup.profile", "recall")
    try {
      assert(DedupQueries.numPerms(spark) == 32)
      assert(DedupQueries.rowsPerBand(spark) == 8)
    } finally unsetAll()
  }

  test("profile=recall ≡ explicit num_perms=32 + rows_per_band=8 (bit-equal d7 pairs)") {
    val explicitRows = {
      spark.conf.set("graft.dedup.num_perms", "32")
      spark.conf.set("graft.dedup.rows_per_band", "8")
      try graft.SparkEntry.queries("d7_lsh_bucket_cap")(spark, sf0001)
        .collect().toSeq
      finally unsetAll()
    }
    val presetRows = {
      spark.conf.set("graft.dedup.profile", "recall")
      try graft.SparkEntry.queries("d7_lsh_bucket_cap")(spark, sf0001)
        .collect().toSeq
      finally unsetAll()
    }
    assert(presetRows.nonEmpty,
      "planted near-dups must survive the 4×8 banding on sf0.001")
    assert(presetRows == explicitRows)
  }

  test("a conflicting explicit dial under the profile fails loudly") {
    spark.conf.set("graft.dedup.profile", "recall")
    spark.conf.set("graft.dedup.num_perms", "16")
    try {
      val e = intercept[IllegalArgumentException](
        DedupQueries.numPerms(spark))
      assert(e.getMessage.contains("num_perms"))
    } finally unsetAll()
    spark.conf.set("graft.dedup.profile", "recall")
    spark.conf.set("graft.dedup.rows_per_band", "4")
    try intercept[IllegalArgumentException](
      DedupQueries.rowsPerBand(spark))
    finally unsetAll()
  }

  test("an explicit dial MATCHING the preset is accepted") {
    spark.conf.set("graft.dedup.profile", "recall")
    spark.conf.set("graft.dedup.num_perms", "32")
    spark.conf.set("graft.dedup.rows_per_band", "8")
    try {
      assert(DedupQueries.numPerms(spark) == 32)
      assert(DedupQueries.rowsPerBand(spark) == 8)
    } finally unsetAll()
  }

  test("an unknown profile value fails loudly") {
    spark.conf.set("graft.dedup.profile", "speed")
    try {
      val e = intercept[IllegalArgumentException](
        DedupQueries.numPerms(spark))
      assert(e.getMessage.contains("speed"))
    } finally unsetAll()
  }

  test("the profile does not disturb the bucket-cap dial") {
    spark.conf.set("graft.dedup.profile", "recall")
    try assert(DedupQueries.bucketCap(spark) == 2)
    finally unsetAll()
  }

  test("the recall advisory treats the profile as dialed") {
    // same saturated fixture shape as DedupRecallAdvisorySpec: 30
    // groups of 4 byte-identical docs swamp the default cap
    val dir = java.nio.file.Files
      .createTempDirectory("graft_profile_adv_").toString
    import spark.implicits._
    val dup = (0 until 120).map { i =>
      val g = i / 4
      val text = (0 until 12).map(k => s"pre${g}tok${k}g$g").mkString(" ")
      (i.toLong, text, "en", s"srcdup$g", 100L)
    }
    val uniq = (0 until 10).map { i =>
      val text = (0 until 12).map(k => s"uniq${i}tok${k}u$i").mkString(" ")
      (120 + i.toLong, text, "en", s"src$i", 90L)
    }
    (dup ++ uniq).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(DedupQueries.maybeWarnDedupRecall(spark, dir),
      "fixture must fire at defaults")
    spark.conf.set("graft.dedup.profile", "recall")
    try assert(!DedupQueries.maybeWarnDedupRecall(spark, dir),
      "a profiled session owns its recall/cost trade — no advisory")
    finally unsetAll()
  }
}
