package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** d11 semantics and scale-shape pins.
  *
  * Semantics: on a corpus with one dup group spanning the history/
  * incoming split, one dup group entirely inside the incoming batch,
  * and token-reshuffled (not byte-identical) copies, statuses come out
  * 'history' / 'batch' (all but the first batch occurrence) / 'new'.
  * Doc ids are chosen so their md5 buckets land on the intended side
  * of c2's >= 90 split (8/27/44 are >= 90; 0..7 are < 90).
  *
  * Scale shape: the bloom path must equal a plain anti-join
  * formulation on the real testdata (the bloom is an optimization,
  * never a semantics change), and the history scan must carry the
  * inlined might_contain predicate so history rows are filtered
  * map-side before any exchange.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  import graft.QueryHarness._

  private def corpus(dir: String): Unit = {
    import spark.implicits._
    val docs = Seq(
      // history (bucket < 90)
      (0L, "alpha beta gamma delta", "en", "s0", 22L),
      (1L, "epsilon zeta eta theta", "en", "s0", 22L),
      (2L, "iota kappa lambda mu", "en", "s0", 20L),
      // incoming (bucket >= 90):
      // 8 = token-reshuffled copy of history doc 0 -> 'history'
      (8L, "delta gamma beta alpha", "en", "s1", 22L),
      // 27 and 44 share a token set, neither in history ->
      // 27 (min id) 'new', 44 'batch'
      (27L, "nu xi omicron pi", "en", "s1", 16L),
      (44L, "pi omicron xi nu nu", "en", "s1", 19L),
      // 53 matches nothing -> 'new'
      (53L, "rho sigma tau upsilon", "en", "s1", 21L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("d11 classifies history/batch/new on planted dup groups") {
    val dir = java.nio.file.Files.createTempDirectory("graft_d11").toString
    corpus(dir)
    val out = DedupQueries.queries("d11_incremental_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out === Map(8L -> "history", 27L -> "new", 44L -> "batch",
      53L -> "new"))
  }

  test("bloom path equals the direct anti-join formulation on testdata") {
    val bloom = DedupQueries.queries("d11_incremental_dedup")(spark, sf001)
    // direct formulation: no sketch, plain distinct + joins
    val keyed = graft.Tables.documents(spark, sf001)
      .withColumn("bucket",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 7), 16, 10) AS BIGINT) % 100"))
      .withColumn("digest", md5(expr(
        "array_join(array_sort(array_distinct(filter(split(lower(text), '\\\\s+'), x -> x <> ''))), ' ')")))
    val inc = keyed.where(col("bucket") >= 90).select("doc_id", "digest")
    val hist = keyed.where(col("bucket") < 90).select("digest").distinct()
    val firsts = inc.groupBy("digest").agg(min("doc_id").as("first_doc"))
    val direct = inc
      .join(hist.withColumn("in_history", lit(1)), Seq("digest"), "left")
      .join(firsts, Seq("digest"))
      .select(col("doc_id"), col("digest"),
        when(col("in_history") === 1, "history")
          .when(col("doc_id") > col("first_doc"), "batch")
          .otherwise("new").as("status"))
    assert(bloom.collect().toSet === direct.collect().toSet)
    assert(bloom.count() === 52)
  }

  test("history scan is filtered by an inlined bloom predicate") {
    val plan = DedupQueries.queries("d11_incremental_dedup")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"incoming must prefilter through the constant sketch:\n$plan")
  }

  test("count-sized bloom sketch holds its FP bound at 10x the old " +
      "fixed capacity; the fixed size degrades") {
    import graft.QueryHarness.spark
    // 10M history keys — 10x the old fixed 1<<20 expectedItems. The
    // count-sized sketch must keep the FP rate a real prefilter;
    // the old fixed sizing at this scale silently degrades toward
    // let-everything-through (the 100 TB failure mode: the map-side
    // prefilter becomes the full history shuffle it exists to avoid).
    val n = 10_000_000L
    val keys = spark.range(0, n).select(col("id").as("bk"))
    val sized = keys
      .agg(graft.functions.BloomSketch
        .build(col("bk"), HistorySnapshot.sketchItems(n)).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val fixed = keys
      .agg(graft.functions.BloomSketch.build(col("bk"), 1L << 20).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    // disjoint probe keys: every hit is a false positive
    val probes = spark.range(n, n + 200_000).select(col("id").as("bk"))
    def fpRate(bf: Array[Byte]): Double =
      probes.where(graft.functions.BloomSketch.mightContain(bf, col("bk")))
        .count().toDouble / 200_000.0
    val fpSized = fpRate(sized)
    val fpFixed = fpRate(fixed)
    assert(fpSized < 0.05, f"sized sketch fp=$fpSized%.4f breaches 5%%")
    assert(fpFixed > 0.20,
      f"fixed 1<<20 sketch at 10M keys should have degraded " +
        f"(fp=$fpFixed%.4f) — if not, this pin is stale")
  }

  test("snapshot table: bucket-pruned reads and idempotent append") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    corpus(dir)
    val snap = HistorySnapshot.forCorpus(spark, dir)
    assert(snap.nDigests == 3 && snap.sketch.nonEmpty)
    // second resolve: the READY marker gates the rebuild (the
    // maintenance-window contract — carried forward, not recomputed)
    assert(HistorySnapshot.forCorpus(spark, dir).nDigests == 3)
    // appendDigests folds a window's new digests in idempotently
    val newDigests = Seq("00ff00ff00ff00ff00ff00ff00ff00ff")
      .toDF("digest")
    HistorySnapshot.appendDigests(spark, snap, newDigests)
    HistorySnapshot.appendDigests(spark, snap, newDigests)
    assert(graft.pol.PoolJsonSink.readTable(spark, snap.tableDir)
      .count() == 4)
    // touchedDigests reads ONLY the buckets the probe digests hash
    // into: a single-digest probe must not open every file
    val m = graft.pol.PoolJsonSink.readManifest(snap.tableDir).get
    val probe = newDigests
    val got = snap.touchedDigests(spark, probe)
      .as[String].collect().toSet
    assert(got.contains("00ff00ff00ff00ff00ff00ff00ff00ff"))
    if (m.buckets.size > 1)
      assert(got.size < 4, "touched-bucket read returned the full table")
  }
}
