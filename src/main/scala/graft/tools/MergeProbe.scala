package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pol.PoolJsonSink

/** MergeProbe <nKeys> <workDir> [nBuckets] — the evidence behind t6's
  * scale claim: delta-driven MERGE maintenance must cost O(delta +
  * touched buckets), never O(table).
  *
  * Seeds a manifest table with nKeys per-user aggregate rows
  * (default 256 buckets — under the 1M-rows/bucket advisory target up
  * to 256M keys; pass nBuckets to probe other layouts), then times
  * (a) a fixed 10-key delta through `PoolJsonSink.mergeDelta` (min of
  * 3), (b) compaction of upsert-touched buckets back to 1 file (the
  * maintenance job an append-heavy table runs; merge-maintained
  * buckets need none — mergeDelta rewrites them), and
  * (c) the naive combine the round-3 t6
  * did — read the WHOLE table, union the delta, re-aggregate every
  * key, rewrite everything (1 rep; it only gets slower). Run at
  * 1e5 / 1e6 / 1e7 / 1.6e7 keys: the mergeDelta time tracks the ~10
  * touched buckets (table_bytes / nBuckets each) while the naive time
  * tracks the table — the ratio is the scaling argument recorded in
  * SCALING.md.
  */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val nKeys = args(0).toLong
    val work = args(1)
    val nBuckets = if (args.length > 2) args(2).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def combine(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("user_id").agg(
        sum(col("n_events")).as("n_events"),
        sum(col("sum_value_dec")).cast("decimal(38,2)")
          .as("sum_value_dec"))
    def delta(seed: Long) = spark.range(10).select(
      concat(lit("u"), (col("id") * (nKeys / 10) + seed) % nKeys)
        .as("user_id"),
      lit(1L).as("n_events"),
      lit(java.math.BigDecimal.ONE).cast("decimal(38,2)")
        .as("sum_value_dec"))

    val dir = s"$work/tbl_$nKeys"
    val base = spark.range(nKeys).select(
      concat(lit("u"), col("id")).as("user_id"),
      lit(1L).as("n_events"),
      col("id").cast("decimal(38,2)").as("sum_value_dec"))
    val (_, tSeed) = timed {
      PoolJsonSink.upsertPartitioned(spark, dir, base, col("user_id"),
        nBuckets = nBuckets)
    }
    // a maintained table is compacted (one file per bucket) — without
    // this the probe times 32-files-per-bucket open overhead, not the
    // merge
    PoolJsonSink.compactPartitions(spark, dir, maxFilesPerPartition = 1)
    PoolJsonSink.vacuum(dir)

    // warm the code paths once on a throwaway table
    val warm = s"$work/tbl_warm"
    PoolJsonSink.upsertPartitioned(spark, warm,
      base.limit(1000), col("user_id"), nBuckets = nBuckets)
    PoolJsonSink.mergeDelta(spark, warm, delta(0), col("user_id"),
      nBuckets = nBuckets)(combine)

    val tMerge = (1 to 3).map { i =>
      timed(PoolJsonSink.mergeDelta(spark, dir, delta(i * 17L),
        col("user_id"), nBuckets = nBuckets)(combine))._2
    }.min

    // the maintenance-cycle compaction claim, settled by measurement:
    // BOTH keyed writers (mergeDelta and upsertPartitioned) REWRITE
    // their touched buckets to one fresh file, so compaction on a
    // maintained table is structurally a no-op — timed here after a
    // 10-key upsert to make that visible (0.00 s at 16M keys; a
    // nonzero value would mean a writer started leaving bucket
    // fragments behind, which is exactly the regression this probe
    // would catch).
    PoolJsonSink.upsertPartitioned(spark, dir, delta(997),
      col("user_id"), nBuckets = nBuckets)
    val (_, tCompact) = timed {
      PoolJsonSink.compactPartitions(spark, dir, maxFilesPerPartition = 1)
    }

    // the round-3 shape: full-table read + full re-agg + full rewrite
    val naiveDir = s"$work/tbl_naive_$nKeys"
    val (_, tNaive) = timed {
      val full = combine(
        PoolJsonSink.readTable(spark, dir)
          .drop("__pt").unionByName(delta(999)))
      PoolJsonSink.upsertPartitioned(spark, naiveDir, full,
        col("user_id"), nBuckets = nBuckets)
    }

    println(f"""{"nKeys":$nKeys,"nBuckets":$nBuckets,"seed_s":$tSeed%.2f,""" +
      f""""compact_s":$tCompact%.2f,""" +
      f""""merge_delta_s":$tMerge%.3f,"naive_full_s":$tNaive%.2f}""")
    spark.stop()
  }
}
