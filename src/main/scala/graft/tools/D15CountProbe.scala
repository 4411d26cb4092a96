package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-census for d15's floor at probe scale:
  * `D15CountProbe <corpusDir> [bucketCap]` prints d7's total
  * candidate pairs, the sub-floor (killed) and kept splits, and how
  * many kept pairs are the generator's PLANTED near-dups (doc_b =
  * doc_a+1, doc_a % 50 == 0) — the ground truth for whether the kept
  * set tracks the linearly-growing dup population or inherits the
  * collision curve. The optional second arg sets the
  * `graft.dedup.bucket_cap` dial (and also prints the corpus's
  * occupancy census + computed recommendation), so the round-10
  * re-dial claim — planted recall restored at the recommended cap at
  * bounded cost — is measurable from one command. The census itself
  * is timed, so cost-at-the-dial comes for free.
  */
object D15CountProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    // the cap is positional-after-flags: `<dir> r=8 32` dials both
    // (args.lift(1) alone silently dropped the cap there — ADVICE r10)
    val capArg = args.drop(1)
      .filterNot(a => a.startsWith("r=") || a.startsWith("k=") ||
        a.startsWith("profile="))
      .headOption.map(_.toInt)
    val rArg = args.find(_.startsWith("r=")).map(_.stripPrefix("r=").toInt)
    val kArg = args.find(_.startsWith("k=")).map(_.stripPrefix("k=").toInt)
    val profArg = args.find(_.startsWith("profile="))
      .map(_.stripPrefix("profile="))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle partitions sized with the data, not the cores: at
    // num_perms=32 the 16M banded relation is 64M rows of 32-long
    // sigs and a 32-partition shuffle-hash build no longer fits task
    // memory (measured: "Can't acquire 536870912 bytes" at 16M) —
    // exactly the charter's partitions-scale-with-SF rule
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    capArg.foreach(c => spark.conf.set("graft.dedup.bucket_cap", c))
    rArg.foreach(r => spark.conf.set("graft.dedup.rows_per_band", r))
    kArg.foreach(k => spark.conf.set("graft.dedup.num_perms", k))
    // `profile=recall` measures the one-touch preset (round-12):
    // must reproduce the k=32 r=8 row exactly (ProfilePresetSpec
    // pins bit-equality; this measures it at probe scale)
    profArg.foreach(p => spark.conf.set("graft.dedup.profile", p))
    val occ = graft.llm.DedupQueries.lshOccupancy(spark, d)
    println(s"""{"occupancy":{"total_rows":${occ.totalRows},""" +
      s""""shed_rows":${occ.sheddedRows},"n_buckets":${occ.nBuckets},""" +
      s""""n_over_cap":${occ.nOverCap},"max_width":${occ.maxWidth},""" +
      f""""shed_frac":${occ.shedFraction}%.4f,"cap_rec":${occ.capRec}},""" +
      s""""dialed_cap":${graft.llm.DedupQueries.bucketCap(spark)}}""")
    val floor = graft.llm.DedupQueries.D15AgreeFloor
    // steady-state d7 timing (the ScaleProbe methodology): discard
    // the first at-scale execution (JIT tax, ~90 s at 16M), report
    // the min of two steady runs, then materialize for the census
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.Bench.force(
        graft.SparkEntry.queries("d7_lsh_bucket_cap")(spark, d))
      (System.nanoTime() - t0) / 1e9
    }
    println(f"d7_first_sample_s ${once()}%.2f (discarded)")
    println(f"d7_steady_s ${math.min(once(), once())}%.2f")
    val cands = graft.SparkEntry.queries("d7_lsh_bucket_cap")(spark, d)
      .select(col("doc_a"), col("doc_b"), col("agreement"))
      .localCheckpoint()
    val planted = col("doc_b") === col("doc_a") + 1 &&
      col("doc_a") % 50 === 0
    val stats = cands.agg(
      count(lit(1)).as("total"),
      sum(when(col("agreement") >= floor, 1L).otherwise(0L)).as("kept"),
      sum(when(col("agreement") >= floor && planted, 1L).otherwise(0L))
        .as("kept_planted"),
      sum(when(planted, 1L).otherwise(0L)).as("planted_total")
    ).head()
    println(s"""{"dir":"$d","floor":$floor,""" +
      s""""total_pairs":${stats.getLong(0)},"kept":${stats.getLong(1)},""" +
      s""""kept_planted":${stats.getLong(2)},""" +
      s""""planted_candidates":${stats.getLong(3)}}""")
    spark.stop()
  }
}
