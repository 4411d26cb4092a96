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
      s"history side must prefilter through the constant sketch:\n$plan")
  }
}
