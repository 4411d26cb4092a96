package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pol.PoolJsonSink

/** Scale probe for metadata-powered planning: stages an nRows keyed
  * table (64 buckets, zone maps on k/v/s) and measures
  *
  *  1. `count(*) / min / max` through the catalog — should be
  *     MILLISECONDS (manifest-only LocalScan) and FLAT in nRows,
  *     vs the same aggregates with pushdown defeated (full scan);
  *  2. a selective out-of-range predicate on an UNINDEXED column —
  *     parquet row-group skipping via the pushed filter, vs the
  *     pre-change behavior approximated by filtering above an
  *     identity-projected scan;
  *  3. LIMIT through the catalog — a file-prefix read.
  *
  * `MetaProbe <nRows>`
  */
object MetaProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files
      .createTempDirectory(s"graft_metaprobe_$n").toString
    val dir = s"$root/tbl"
    val t0 = System.nanoTime()
    PoolJsonSink.upsertPartitioned(spark, dir,
      spark.range(n)
        .select(col("id").as("k"), (col("id") * 7 - 1000).as("v"),
          md5(col("id").cast("string")).as("s"),
          // unindexed payload column for the row-group-skip case
          (col("id") % 1000).as("u"),
          // low-cardinality split candidate (8 values × 64 buckets
          // → 512 value-pure files after the layout pass)
          (col("id") % 8).as("grp")),
      col("k"), nBuckets = 64, statsCols = Seq("k", "v", "s"))
    println(f"stage $n rows: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    spark.conf.set("spark.sql.catalog.gmp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmp.warehouse", s"$root/wh")
    spark.sql(s"CREATE TABLE gmp.default.t USING graft LOCATION '$dir'")

    def time(tag: String)(df: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t = System.nanoTime()
        val d = df
        d.write.format("noop").mode("overwrite").save()
        if (i == 3)
          println(f"$tag: ${(System.nanoTime() - t) / 1e9}%.3f s")
      }
    }

    time("agg via metadata          ")(spark.sql(
      "SELECT count(*), min(v), max(v), min(s), max(s) FROM gmp.default.t"))
    // defeat the pushdown with a vacuous predicate no source filter
    // can express (k % 2 >= 0) — same answer, full data path. (The
    // previous trick, k >= Long.MinValue, stopped working the day
    // exact filter pushdown learned to PROVE it covers every file.)
    time("agg via full scan         ")(spark.sql(
      "SELECT count(*), min(v), max(v), min(s), max(s) " +
        "FROM gmp.default.t WHERE k % 2 >= 0 OR k % 2 < 0"))
    time("out-of-range pt lookup (u)")(spark.sql(
      s"SELECT * FROM gmp.default.t WHERE u = ${n * 10}"))
    time("in-range pt lookup (u)    ")(spark.sql(
      "SELECT * FROM gmp.default.t WHERE u = 37"))
    time("limit 100                 ")(spark.sql(
      "SELECT * FROM gmp.default.t LIMIT 100"))
    time("full scan (reference)     ")(spark.sql(
      "SELECT * FROM gmp.default.t"))

    // --- the split layout and what it buys (one-time rewrite, then
    // grouped metadata aggregates + metadata-only DELETE) ---
    val tSplit = System.nanoTime()
    spark.sql("CALL gmp.system.optimize(tbl => 'default.t', " +
      "zorder => 'grp', split_by => 'grp')")
    println(f"optimize(split_by=grp) layout pass: " +
      f"${(System.nanoTime() - tSplit) / 1e9}%.1f s " +
      f"(${PoolJsonSink.readManifest(dir).get.files.size} files)")
    time("grouped agg via metadata  ")(spark.sql(
      "SELECT grp, count(*), count(s), min(v), max(v) " +
        "FROM gmp.default.t GROUP BY grp"))
    time("grouped agg via full scan ")(spark.sql(
      "SELECT grp, count(*), count(s), min(v), max(v) " +
        "FROM gmp.default.t WHERE k % 2 >= 0 OR k % 2 < 0 GROUP BY grp"))
    time("filtered agg via metadata ")(spark.sql(
      "SELECT count(*), min(v), max(v) " +
        "FROM gmp.default.t WHERE grp = 3"))
    time("filtered scan, exact files")(spark.sql(
      "SELECT * FROM gmp.default.t WHERE grp = 3"))
    val tDel = System.nanoTime()
    spark.sql("DELETE FROM gmp.default.t WHERE grp = 7")
    println(f"metadata DELETE (grp = 7): " +
      f"${(System.nanoTime() - tDel) / 1e9}%.3f s " +
      s"(op=${PoolJsonSink.readManifest(dir).get.op.orNull})")
    val tCow = System.nanoTime()
    spark.sql("DELETE FROM gmp.default.t WHERE u < 125")
    println(f"COW DELETE (u < 125, straddles files): " +
      f"${(System.nanoTime() - tCow) / 1e9}%.1f s " +
      s"(op=${PoolJsonSink.readManifest(dir).get.op.orNull})")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
