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
    val dim = GameLookup.load(spark, lookupCsv)
    // File-granular source (binaryFile): one row per new file, so the
    // batch itself IS the file inventory — 0-byte and all-unparseable
    // files still produce a size-0 document and are recorded, exactly
    // like the reference's per-file loop; decoding reuses the
    // reference's per-file encoding-fallback chain.
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val raw = spark.readStream
      .format("binaryFile")
      .schema(binarySchema)
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.pol")
      .option("maxFilesPerTrigger", 64)
      .load(root)
      .select(col("path"), col("content"))
    val processed = spark.sparkContext.longAccumulator("pol_files_processed")

    val q = raw.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val base = new java.io.File(root).getAbsolutePath.stripSuffix("/")
          val parsed = PolParser.parse(
            PolParser.decodeLines(batch.select("path", "content"), base))
          val inventory = PolParser.pathMeta(
              batch.select(col("path").as("abs_path")), base)
            .withColumn("file_name",
              substring_index(col("relative_path"), "/", -1))
            .select("relative_path", "file_name", "folder_path",
              "parent_folder")
          val pools = PoolMetrics.perPool(parsed, dim, Some(inventory))
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
