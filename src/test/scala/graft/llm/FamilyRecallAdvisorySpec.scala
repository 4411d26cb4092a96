package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-10 verdict item 3: the occupancy census + recall advisory,
  * generalized from the d-family to d9 (hyperplane buckets) and m5
  * (Hamming bands) — the identical cap-sheds-recall contract each
  * carried silently. Red/green pair per family: fires on a saturated
  * fixture at default dials, silent on healthy testdata, silent when
  * the operator has dialed.
  */
class FamilyRecallAdvisorySpec extends AnyFunSuite {
  import graft.QueryHarness._

  /** ≥`width` near-identical embeddings (same direction, so every
    * hash table puts them in ONE bucket) + `nDistinct` spread ones.
    */
  private def saturatedEmbeddings(width: Int, nDistinct: Int): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_emb_adv_").toString
    import spark.implicits._
    val dup = (0 until width).map { i =>
      // tiny jitter on ONE component keeps vectors distinct without
      // flipping any hyperplane sign decision materially
      val e = Array.tabulate(64)(j =>
        (if (j == 0) 10f else 0.01f * j) + (if (j == 63) i * 1e-6f else 0f))
      (i.toLong, e, 0)
    }
    val uniq = (0 until nDistinct).map { i =>
      val e = Array.tabulate(64)(j =>
        math.sin(i * 37.0 + j * 13.0).toFloat)
      (width + i.toLong, e, 1)
    }
    (dup ++ uniq).toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** `nGroups` groups of `width` byte-identical docs (identical dHash
    * ⇒ all 4 bands collide) + `nDistinct` unique long docs.
    */
  private def saturatedPhashCorpus(
      nGroups: Int, width: Int, nDistinct: Int): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phash_adv_").toString
    import spark.implicits._
    val dup = (0 until nGroups * width).map { i =>
      val g = i / width
      val text = (0 until 70).map(k => s"grp${g}word$k").mkString(" ")
      (i.toLong, text, "en", s"src$g", 100L)
    }
    val uniq = (0 until nDistinct).map { i =>
      val text = (0 until 70).map(k => s"uniq${i}tok${k}x$i").mkString(" ")
      (nGroups * width + i.toLong, text, "en", s"usrc$i", 90L)
    }
    (dup ++ uniq).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d9 advisory fires on a saturated embedding corpus at default dials") {
    // width > D9BucketCap so the duplicate bucket is over-cap in all
    // 4 tables: shed ≈ 4·width / (4·(width + nDistinct)) > 10%
    val dir = saturatedEmbeddings(width = 1100, nDistinct = 50)
    assert(SimilarityQueries.maybeWarnEmbeddingRecall(spark, dir))
    val occ = SimilarityQueries.embOccupancy(spark, dir)
    assert(occ.shedFraction > 0.5, s"shed=${occ.shedFraction}")
    assert(occ.maxWidth >= 1100L)
  }

  test("d9 advisory is silent on healthy testdata") {
    assert(!SimilarityQueries.maybeWarnEmbeddingRecall(spark, sf0001))
    assert(!SimilarityQueries.maybeWarnEmbeddingRecall(spark, sf001))
    assert(SimilarityQueries.embOccupancy(spark, sf001).shedFraction == 0.0)
  }

  test("d9 advisory is silent when the operator has dialed planes/tables") {
    val dir = saturatedEmbeddings(width = 1100, nDistinct = 50)
    spark.conf.set("graft.emb.planes", "10")
    try assert(!SimilarityQueries.maybeWarnEmbeddingRecall(spark, dir))
    finally spark.conf.unset("graft.emb.planes")
  }

  test("d9's plane/table dials change the mined pair set's banding") {
    // more planes ⇒ narrower buckets: the banded relation's bucket
    // count per vector stays = tables, but bucket ids spread over
    // 2^planes per table
    val bk6 = SimilarityQueries.embBucketRel(spark, sf0001, 6, 4)
      .select("bucket").distinct().count()
    val bk8 = SimilarityQueries.embBucketRel(spark, sf0001, 8, 4)
      .select("bucket").distinct().count()
    assert(bk8 > bk6, s"planes=8 buckets=$bk8 vs planes=6 $bk6")
  }

  test("m5 advisory fires on a saturated media corpus at default dials") {
    val dir = saturatedPhashCorpus(nGroups = 5, width = 60, nDistinct = 40)
    assert(MultimodalQueries.maybeWarnPhashRecall(spark, dir))
    val occ = MultimodalQueries.phashOccupancy(spark, dir)
    assert(occ.shedFraction > MultimodalQueries.PhashShedWarnFraction,
      s"shed=${occ.shedFraction}")
  }

  test("m5 advisory is silent on testdata (its ~20% shed is the designed blob)") {
    // the sub-33-token all-zero-band blob sheds 19–23% BY DESIGN
    // (CensusProbe round 11) — m5's threshold is calibrated above it
    assert(!MultimodalQueries.maybeWarnPhashRecall(spark, sf0001))
    assert(!MultimodalQueries.maybeWarnPhashRecall(spark, sf001))
    val shed = MultimodalQueries.phashOccupancy(spark, sf001).shedFraction
    assert(shed > 0.1 && shed < MultimodalQueries.PhashShedWarnFraction,
      s"testdata shed=$shed should sit in the designed band")
  }

  test("m5 advisory is silent when the operator has dialed bands/cap") {
    val dir = saturatedPhashCorpus(nGroups = 5, width = 60, nDistinct = 40)
    spark.conf.set("graft.phash.bucket_cap", "128")
    try assert(!MultimodalQueries.maybeWarnPhashRecall(spark, dir))
    finally spark.conf.unset("graft.phash.bucket_cap")
  }

  test("m5's default banding is unchanged by the refactor (bit-level)") {
    // the parameterized band relation at nb=4 must equal the original
    // inline 4×16-bit expressions
    val rel = MultimodalQueries.phashBandRel(spark, sf0001, 4)
    val orig = graft.Tables.documents(spark, sf0001)
      .withColumn("ph", graft.functions.WordPixelsDhash(col("text")))
      .select(col("doc_id"),
        col("ph.lo").as("lo"), col("ph.hi").as("hi"))
      .select(col("doc_id"), explode(array(
        expr("0 * 65536 + (lo & 65535)"),
        expr("1 * 65536 + (shiftright(lo, 16) & 65535)"),
        expr("2 * 65536 + (hi & 65535)"),
        expr("3 * 65536 + (shiftright(hi, 16) & 65535)"))).as("bucket"))
    assert(rel.select("doc_id", "bucket").except(orig).isEmpty
      && orig.except(rel.select("doc_id", "bucket")).isEmpty)
  }

  test("m5's bands dial changes the blocking (2 bands of 32 bits)") {
    val rel2 = MultimodalQueries.phashBandRel(spark, sf0001, 2)
    import spark.implicits._
    assert(rel2.groupBy("doc_id").count()
      .select(max("count")).as[Long].head() == 2L)
  }

  /** One source holding `wide` docs (over the default BlockCap) plus
    * `nDistinct` one-doc sources.
    */
  private def wideSourceCorpus(wide: Int, nDistinct: Int): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_block_adv_").toString
    import spark.implicits._
    val big = (0 until wide).map { i =>
      (i.toLong, s"crawl doc $i with words $i", "en", "megacrawl", 30L)
    }
    val uniq = (0 until nDistinct).map { i =>
      (wide + i.toLong, s"unique doc $i", "en", s"src$i", 20L)
    }
    (big ++ uniq).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("block-cap advisory fires when one source dwarfs the default cap") {
    val dir = wideSourceCorpus(wide = 1100, nDistinct = 50)
    assert(DedupQueries.maybeWarnBlockCap(spark, dir))
    val occ = DedupQueries.blockOccupancy(spark, dir)
    assert(occ.shedFraction > 0.9, s"shed=${occ.shedFraction}")
    assert(occ.maxWidth == 1100L)
  }

  test("block-cap advisory is silent on testdata (sources ≤ 250 docs)") {
    assert(!DedupQueries.maybeWarnBlockCap(spark, sf0001))
    assert(!DedupQueries.maybeWarnBlockCap(spark, sf001))
    assert(DedupQueries.blockOccupancy(spark, sf001).shedFraction == 0.0)
  }

  test("block-cap advisory is silent when the operator has dialed") {
    val dir = wideSourceCorpus(wide = 1100, nDistinct = 50)
    spark.conf.set("graft.dedup.block_cap", "2000")
    try assert(!DedupQueries.maybeWarnBlockCap(spark, dir))
    finally spark.conf.unset("graft.dedup.block_cap")
  }

  test("the block-cap dial actually binds d4's block admission") {
    // block_cap=1 excludes every multi-doc testdata source: the exact
    // baseline must go empty, and restore at defaults
    val atDefault = graft.SparkEntry
      .queries("d4_ngram_jaccard")(spark, sf0001).count()
    spark.conf.set("graft.dedup.block_cap", "1")
    try {
      val dialed = graft.SparkEntry
        .queries("d4_ngram_jaccard")(spark, sf0001).count()
      assert(dialed == 0L, s"cap=1 rows=$dialed")
    } finally spark.conf.unset("graft.dedup.block_cap")
    assert(atDefault > 0L, "testdata must have in-cap near-dup pairs")
  }
}
