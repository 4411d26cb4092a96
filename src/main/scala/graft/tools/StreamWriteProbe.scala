package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pol.PoolJsonSink

/** Prices the streaming toTable write path at probe scale: a 4M-row
  * keyed table takes a delta-sized epoch through (a) the DSv2
  * StreamingWrite (executor staging + driver merge of the staged
  * files) vs (b) the direct foreachBatch-style `upsertPartitioned` —
  * the honest cost of the name-based convenience over the Scala
  * recipe it wraps.
  *
  * `StreamWriteProbe <nRows>`
  */
object StreamWriteProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files
      .createTempDirectory(s"graft_swprobe_$n").toString
    spark.conf.set("spark.sql.catalog.gsw", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsw.warehouse", s"$root/wh")
    spark.sql("CREATE TABLE gsw.default.t (k BIGINT, payload STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='64')")
    val dir = s"$root/wh/default/t"
    PoolJsonSink.upsertPartitioned(spark, dir,
      spark.range(n.toLong).select(col("id").as("k"),
        md5(col("id").cast("string")).as("payload")),
      col("k"), nBuckets = 64)
    val delta = n / 1000

    def deltaDf(tag: Int) = spark.range(delta.toLong)
      .select((col("id") * 997L % n).as("k"),
        concat(lit(s"u$tag-"), col("id")).as("payload"))

    // (a) the streaming write: one epoch per drain via a json source
    (1 to 3).foreach { i =>
      val src = java.nio.file.Files
        .createTempDirectory("graft_swp_src").toString
      deltaDf(i).write.mode("append").json(src)
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_swp_ckpt").toString
      val t0 = System.nanoTime()
      val q = spark.readStream.schema("k BIGINT, payload STRING")
        .json(src)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("gsw.default.t")
      q.awaitTermination()
      println(f"toTable epoch rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // (b) the direct Scala merge of the same delta shape
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      PoolJsonSink.upsertPartitioned(spark, dir, deltaDf(10 + i),
        col("k"), nBuckets = 64)
      println(f"direct upsert rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
