package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pol.{GameLookup, PolParser, PoolMetrics, PoolJsonSink}

/** T1 — the reference's incremental changed-files mode
  * (`etl/extract.py:161-211`, `.github/workflows/etl_pipeline.yml`)
  * re-expressed as Structured Streaming: the file source's checkpoint
  * IS the changed-files tracker (exactly-once per file), and
  * `Trigger.AvailableNow` gives the reference's "process what's new,
  * then exit" batch-ish semantics. A fresh checkpoint dir degrades to
  * the reference's full-scan fallback.
  *
  * Each micro-batch runs the SAME batch pipeline (parse → metrics →
  * documents) via foreachBatch and upserts into the consolidated JSON
  * sink — one code path for batch and streaming.
  */
object IncrementalPol {

  /** Process new/changed .pol files under `root` and upsert their
    * documents into `outputFile`; returns the number of files
    * processed this run.
    */
  def runOnce(
      spark: SparkSession,
      root: String,
      lookupCsv: String,
      outputFile: java.nio.file.Path,
      checkpointDir: String,
      processedAt: Option[String] = None): Long = {
    val dim = GameLookup.fromCsv(spark, lookupCsv)
    val raw = spark.readStream
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.pol")
      .option("maxFilesPerTrigger", 64)
      .text(root)
      .select(col("value"),
        col("_metadata.file_path").as("abs_path"),
        col("_metadata.file_name").as("file_name"))
    val processed = spark.sparkContext.longAccumulator("pol_files_processed")

    val q = raw.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val base = new java.io.File(root).getAbsolutePath.stripSuffix("/")
          val rel = regexp_replace(
            regexp_replace(col("abs_path"), "^file:/*", "/"),
            "^" + java.util.regex.Pattern.quote(base) + "/", "")
          val withMeta = batch
            .withColumn("relative_path", rel)
            .withColumn("folder_path",
              when(col("relative_path").contains("/"),
                regexp_replace(col("relative_path"), "/[^/]*$", ""))
                .otherwise(lit("")))
            .withColumn("parent_folder",
              substring_index(col("folder_path"), "/", -1))
          val parsed = PolParser.parse(withMeta)
          val pools = PoolMetrics.perPool(parsed, dim)
          val docs = PoolMetrics.documents(pools, processedAt).collect().toSeq
          PoolJsonSink.upsert(docs, outputFile)
          processed.add(docs.size.toLong)
        }
        ()
      }
      .start()
    q.awaitTermination()
    processed.value
  }
}
