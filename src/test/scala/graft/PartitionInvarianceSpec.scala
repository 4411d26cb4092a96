package graft

import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB determinism claim, tested locally: results must be
  * byte-identical when parallelism and input-split sizes change —
  * different shuffle partition counts and file-split boundaries are
  * exactly what a 1000-executor cluster does differently from
  * local[4]. Queries chosen for their order-sensitivity risk:
  * decimal-exact aggregation (a6), iterative label propagation (c1),
  * hash-bucketed pair mining (d3), decimal-mean centroids (n2),
  * map-side partial counts (x5), bit-interleave tiling (o6), and the
  * md5 split (c2).
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  import QueryHarness._

  private val names = Seq(
    "a6_volatility", "c1_dedup_clusters", "d3_minhash_lsh_pairs",
    "n2_ann_ivf", "x5_repetition", "o6_zorder_layout", "c2_hash_split",
    // round-3: span-hash pair mining, vocab-global rank + integer ppm,
    // decimal frame sum, interpolated percentiles + sketch flag
    "x11_dup_spans", "x12_vocab_build", "w2_event_rolling",
    "r20_percentiles",
    // round-4: bounded max(struct) selection, capped pair matrix,
    // 2-iteration decimal k-means, integer-ppm rarity
    "c8_keep_best_duplicate", "d10_cross_source_overlap",
    "n7_kmeans", "x13_rarity_score")

  private def run(name: String, parts: String, split: String): Seq[String] = {
    val prevP = spark.conf.get("spark.sql.shuffle.partitions")
    val prevS = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.files.maxPartitionBytes", split)
      SparkEntry.queries(name)(spark, sf0001).collect().map(_.toString).toSeq
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevP)
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevS)
    }
  }

  names.foreach { name =>
    test(s"$name is invariant under partitioning and split size") {
      val a = run(name, "3", "134217728")
      val b = run(name, "17", "65536")
      assert(a == b, s"$name diverged across partitionings")
    }
  }
}
