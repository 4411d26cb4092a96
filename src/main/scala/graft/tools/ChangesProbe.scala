package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pol.{ChangeFeed, PoolJsonSink}

/** Scale probe for the streaming-by-name redesign: stages an nRows
  * keyed table (64 buckets), commits a SMALL delta (nRows/1000 keys),
  * and times the (head-1, head] change read through both faces —
  * the v1 driver-assembled diff plan (`ChangeFeed.readTableChanges`)
  * and the v2 per-changed-bucket partition readers
  * (`<cat>.default.t.changes`) — plus the genesis full-snapshot read.
  * The claim under test: per-batch cost tracks the DELTA, and the v2
  * reader pays no driver-side planning tax per batch.
  *
  * `ChangesProbe <nRows> [nBuckets]`
  */
object ChangesProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4000000)
    val nBuckets = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files
      .createTempDirectory(s"graft_chprobe_$n").toString
    val dir = s"$root/tbl"
    val t0 = System.nanoTime()
    PoolJsonSink.upsertPartitioned(spark, dir,
      spark.range(n.toLong)
        .select(col("id").as("k"),
          md5(col("id").cast("string")).as("payload")),
      col("k"), nBuckets = nBuckets)
    println(f"stage $n rows: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val delta = n / 1000
    PoolJsonSink.upsertPartitioned(spark, dir,
      spark.range(delta.toLong)
        .select((col("id") * 1000L).as("k"), lit("v2").as("payload")),
      col("k"), nBuckets = nBuckets)
    val head = PoolJsonSink.readManifest(dir).get.version

    spark.conf.set("spark.sql.catalog.gpr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpr.warehouse", s"$root/wh")
    spark.sql(s"CREATE TABLE gpr.default.t USING graft LOCATION '$dir'")

    def time(tag: String)(df: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val s0 = System.nanoTime()
        val c = df.count()
        println(f"$tag rep$i: ${(System.nanoTime() - s0) / 1e9}%.2f s " +
          f"($c rows)")
      }
    }
    time("v1 delta diff")(ChangeFeed.readTableChanges(
      spark, dir, head - 1, head, col("k")))
    time("v2 delta diff")(spark.read
      .option("startingVersion", (head - 1).toString)
      .option("endingVersion", head.toString)
      .table("gpr.default.t.changes"))
    time("v1 genesis")(ChangeFeed.readTableChanges(
      spark, dir, 0L, head, col("k")))
    time("v2 genesis")(spark.read
      .option("endingVersion", head.toString)
      .table("gpr.default.t.changes"))
    spark.stop()
  }
}
