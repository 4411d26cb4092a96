package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression

/** Partitions-scale-with-data in the ENGINE (round-11 verdict item
  * 1): the d3/d7/d15 banded exchanges size themselves from estimated
  * banded bytes (rows × numPerms × 8 + overhead) instead of trusting
  * `spark.sql.shuffle.partitions` — the 16M-doc k=32 probe OOM'd its
  * 32-partition shuffle-hash build while following the advisory's own
  * recommended dial. The sizing function is pure (pinnable without a
  * 16M corpus), and the computed count must actually reach the plan.
  */
class BandedExchangeSpec extends AnyFunSuite {
  import graft.QueryHarness._

  test("the 16M k=32 OOM regime computes hundreds of partitions, not 32") {
    // 64M banded rows × (16 B keys + 256 B sig + 32 B header) × 2
    // build overhead ≈ 39 GB → ~290 partitions at the 128 MB target;
    // each task's build side lands near the scan-side partition size
    val p = DedupQueries.bandedPartitionsFor(
      bandedRows = 64L * 1000 * 1000, perms = 32,
      defaultParts = 32, targetBytes = 128L * 1024 * 1024)
    assert(p > 200 && p < 1000, s"p=$p")
  }

  test("small corpora keep the session default (no needless fan-out)") {
    // sf0.001: 500 docs × 4 bands = 2000 rows ≈ 0.7 MB — the session
    // default must win
    assert(DedupQueries.bandedPartitionsFor(
      2000L, 16, 4, 128L * 1024 * 1024) == 4)
    assert(DedupQueries.bandedPartitionsFor(
      2000L, 16, 32, 128L * 1024 * 1024) == 32)
  }

  test("the computed count is monotone in rows and perms") {
    val base = DedupQueries.bandedPartitionsFor(
      64L * 1000 * 1000, 16, 32, 128L * 1024 * 1024)
    val moreRows = DedupQueries.bandedPartitionsFor(
      256L * 1000 * 1000, 16, 32, 128L * 1024 * 1024)
    val morePerms = DedupQueries.bandedPartitionsFor(
      64L * 1000 * 1000, 64, 32, 128L * 1024 * 1024)
    assert(moreRows > base && morePerms > base)
  }

  test("d7's plan carries the engine-computed exchange, not the session's") {
    // shrink the per-partition target so even sf0.001 computes an
    // over-default fan-out, then find the explicit repartition in the
    // analyzed plan with exactly that partition count
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    try {
      val want = DedupQueries.bandedPartitions(spark, sf0001)
      assert(want > spark.sessionState.conf.numShufflePartitions,
        s"fixture must force an over-default count, got $want")
      val df = graft.SparkEntry.queries("d7_lsh_bucket_cap")(spark, sf0001)
      val counts = df.queryExecution.analyzed.collect {
        case r: RepartitionByExpression => r.optNumPartitions
      }.flatten
      assert(counts.contains(want),
        s"plan repartitions=$counts, engine computed $want")
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("the shingle-side exchanges (d4/d10) size the same way") {
    // 16M docs × ~60 chars ≈ 1e9 shingle rows × 56 B × 2 ≈ 104 GB →
    // hundreds of partitions at the 128 MB target
    val p = DedupQueries.exchangePartitionsFor(
      1000L * 1000 * 1000, 56L, 32, 128L * 1024 * 1024)
    assert(p > 500 && p < 2000, s"p=$p")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    try {
      // sf0.001 Σ n_chars ≈ 190k → 190k×56×2/8192 ≈ 2.6k partitions
      val cc = DedupQueries.charCount(spark, sf0001)
      assert(cc > 0L)
      val want = DedupQueries.exchangePartitionsFor(cc, 56L,
        spark.sessionState.conf.numShufflePartitions, 8192L)
      assert(want > spark.sessionState.conf.numShufflePartitions)
      for (q <- Seq("d4_ngram_jaccard", "d10_cross_source_overlap")) {
        val counts = graft.SparkEntry.queries(q)(spark, sf0001)
          .queryExecution.analyzed.collect {
            case r: RepartitionByExpression => r.optNumPartitions
          }.flatten
        assert(counts.contains(want),
          s"$q repartitions=$counts, engine computed $want")
      }
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("the sized shingle exchange is value-invariant (d4/d10 rows identical)") {
    val base = Seq("d4_ngram_jaccard", "d10_cross_source_overlap")
      .map(q => graft.SparkEntry.queries(q)(spark, sf0001).collect().toSeq)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    try {
      val fanned = Seq("d4_ngram_jaccard", "d10_cross_source_overlap")
        .map(q => graft.SparkEntry.queries(q)(spark, sf0001).collect().toSeq)
      assert(fanned == base)
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("the sized exchange is value-invariant (d7 rows identical)") {
    val atDefault = graft.SparkEntry
      .queries("d7_lsh_bucket_cap")(spark, sf0001).collect().toSeq
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    try {
      val fanned = graft.SparkEntry
        .queries("d7_lsh_bucket_cap")(spark, sf0001).collect().toSeq
      assert(fanned == atDefault)
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }
}
