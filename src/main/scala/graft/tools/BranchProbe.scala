package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.pol.PoolJsonSink

/** Branch-cost probe: `BranchProbe [fileCounts ...]` (default
  * 128 512 2048). For each target file count F, builds a graft table
  * whose manifest references ~F data files (64 buckets, F/64 upsert
  * rounds with optimizedWrite so each round adds one file per
  * bucket), then times: createBranch (the hard-link fork), one keyed
  * merge INTO the branch, and publishBranch (link-back + one CAS
  * commit). The claim under test: branch lifecycle cost is O(files)
  * NAMESPACE ops — no data bytes move — so the curve must track file
  * count at millisecond scale, not data size.
  */
object BranchProbe {
  def main(args: Array[String]): Unit = {
    val counts = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(128, 512, 2048)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("files | rows | create_s | branch_merge_s | publish_s")
    counts.foreach { f =>
      val nBuckets = 64
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_branch_probe_$f").toString + "/t"
      // optimizedWrite=false keeps the task layout: T tasks each
      // holding keys of every bucket stage ~T files per bucket, so
      // ONE commit manufactures a ~f-file manifest (the shape a
      // pre-clustered production writer leaves behind)
      val tasks = math.max(f / nBuckets, 1)
      val df = spark.range(0, 1600000)
        .repartition(tasks)
        .select(col("id").as("k"),
          (col("id") % 97).cast("string").as("v"))
      PoolJsonSink.upsertPartitioned(spark, dir, df, col("k"), nBuckets,
        optimizedWrite = false)
      val m = PoolJsonSink.readManifest(dir).get
      val nFiles = m.files.size
      val nRows = 1600000L

      def time[T](body: => T): (T, Double) = {
        val t0 = System.nanoTime()
        val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (_, tCreate) = time(PoolJsonSink.createBranch(dir, "probe"))
      val bdir = PoolJsonSink.branchDir(dir, "probe")
      val (_, tMerge) = time {
        val df = spark.range(0, 1000)
          .select(col("id").as("k"),
            org.apache.spark.sql.functions.lit("patched").as("v"))
        PoolJsonSink.upsertPartitioned(spark, bdir, df, col("k"), nBuckets)
      }
      val (_, tPublish) = time(PoolJsonSink.publishBranch(dir, "probe"))
      println(f"$nFiles%5d | $nRows%7d | $tCreate%.3f | $tMerge%.3f | $tPublish%.3f")
    }
    spark.stop()
  }
}
