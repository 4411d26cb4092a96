package graft.tools

import java.util.concurrent.atomic.DoubleAdder

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pol.PoolJsonSink

/** T6SplitProbe <sfDir> <mode> — splits t6's per-batch cost into
  * merge vs inline compaction/vacuum (the round-4 VERDICT ask: the
  * 4.32→7.57 s regression bought atomic delta-driven maintenance,
  * but which share is the merge and which is the inline compaction?).
  *
  * mode: inline  = compact+vacuum every 2nd batch (the t6 shape)
  *       post    = compact+vacuum ONCE after the stream finishes
  *       off     = never (unbounded small files — lower bound only)
  *
  * Prints one line with stream wall time and the summed per-phase
  * seconds; the phase timers run inside foreachBatch on the driver,
  * so merge_s + maint_s ≈ the foreachBatch share of wall_s and the
  * remainder is fixed streaming machinery (checkpoint I/O, trigger
  * planning).
  */
object T6SplitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mergeS = new DoubleAdder
    val maintS = new DoubleAdder
    def timedInto[A](acc: DoubleAdder)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      acc.add((System.nanoTime() - t0) / 1e9)
      a
    }

    val stage = java.nio.file.Files
      .createTempDirectory("graft_t6probe_stage_").toString
    val table = java.nio.file.Files
      .createTempDirectory("graft_t6probe_table_").toString + "/tbl"
    graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"),
        expr("ts_ns div 1000").as("us"))
      .repartition(4, col("event_id"))
      .write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema

    val t0 = System.nanoTime()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = batch.groupBy("user_id").agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)"))
            .cast("decimal(38,2)").as("sum_value_dec"),
          max(struct(col("us"), col("event_id"))).as("last"))
        timedInto(mergeS) {
          PoolJsonSink.mergeDelta(
            spark, table, delta, col("user_id"), nBuckets = 16)(
            _.groupBy("user_id").agg(
              sum(col("n_events")).as("n_events"),
              sum(col("sum_value_dec")).cast("decimal(38,2)")
                .as("sum_value_dec"),
              max(col("last")).as("last")))
        }
        if (mode == "inline" && (batchId + 1) % 2 == 0) timedInto(maintS) {
          PoolJsonSink.compactPartitions(spark, table,
            maxFilesPerPartition = 2)
          PoolJsonSink.vacuum(table)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wallS = (System.nanoTime() - t0) / 1e9
    if (mode == "post") timedInto(maintS) {
      PoolJsonSink.compactPartitions(spark, table, maxFilesPerPartition = 2)
      PoolJsonSink.vacuum(table)
    }
    val m = PoolJsonSink.readManifest(table).get
    val maxFiles = m.buckets.values.map(_.size).max
    println(f"""{"mode":"$mode","wall_s":$wallS%.2f,""" +
      f""""merge_s":${mergeS.sum}%.2f,"maint_s":${maintS.sum}%.2f,""" +
      f""""max_files_per_bucket":$maxFiles}""")
    spark.stop()
  }
}
