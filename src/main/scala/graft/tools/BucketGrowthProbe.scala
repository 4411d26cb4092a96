package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pol.PoolJsonSink

/** Bucket-count lifecycle at scale (round-7 verdict, Next #7):
  * `BucketGrowthProbe [nKeys]` (default 10M) builds a keyed table at
  * 16 buckets with zone maps on the key, then walks the growth path
  * 16 → 64 → 256 measuring what an operator cares about at each
  * step: keyed-MERGE latency for a 100k delta (the recurring cost an
  * undersized table pays forever), split latency (the one-off
  * migration cost), live file count, and zone-map carry-forward
  * (fraction of live files with recorded key stats — pruning must
  * survive the migration).
  */
object BucketGrowthProbe {
  def main(args: Array[String]): Unit = {
    val nKeys = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_growth")
      .resolve("tbl").toString

    def delta(salt: Long) = spark.range(100000)
      .select((col("id") * 97 + salt).as("k"), lit(salt).as("v"))

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def report(label: String): Unit = {
      val m = PoolJsonSink.readManifest(dir).get
      val files = m.files
      val withStats = files.count(f =>
        m.stats.get(f).exists(_.contains("k")))
      println(s"  [$label] nbuckets=${m.nBuckets.get} files=${files.size} " +
        s"key-zone-maps=${withStats}/${files.size}")
    }

    timed(s"initial write ($nKeys keys, 16)") {
      PoolJsonSink.upsertPartitioned(spark, dir,
        spark.range(nKeys).select(col("id").as("k"),
          (col("id") % 1000).as("v")),
        col("k"), nBuckets = 16, statsCols = Seq("k"))
    }
    report("after load")
    timed("merge 100k delta @16") {
      PoolJsonSink.upsertPartitioned(spark, dir, delta(1), col("k"),
        nBuckets = 16, statsCols = Seq("k"))
    }
    report("after merge @16")

    timed("splitBuckets 16 -> 64") {
      PoolJsonSink.splitBuckets(spark, dir, col("k"), factor = 4)
    }
    report("after split to 64")
    timed("merge 100k delta @64") {
      PoolJsonSink.upsertPartitioned(spark, dir, delta(2), col("k"),
        nBuckets = 64, statsCols = Seq("k"))
    }
    report("after merge @64")

    timed("splitBuckets 64 -> 256") {
      PoolJsonSink.splitBuckets(spark, dir, col("k"), factor = 4)
    }
    report("after split to 256")
    timed("merge 100k delta @256") {
      PoolJsonSink.upsertPartitioned(spark, dir, delta(3), col("k"),
        nBuckets = 256, statsCols = Seq("k"))
    }
    report("after merge @256")

    // correctness backstop: row count is keys + 3 disjoint deltas'
    // new keys (salted multiples of 97 overlap the base range)
    val n = PoolJsonSink.readTable(spark, dir).count()
    println(s"final rows: $n")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir).getParentFile)
    spark.stop()
  }
}
