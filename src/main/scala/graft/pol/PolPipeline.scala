package graft.pol

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Library facade — the Spark analog of the reference's public API
  * (`etl/__init__.py:7-17`), one entry per exported seam so callers
  * can run any stage standalone and compose them as DataFrames:
  *
  * | reference                  | here                      |
  * |----------------------------|---------------------------|
  * | `extract_all_pol_files`    | [[extractAll]]            |
  * | `get_changed_pol_files`    | [[processChanged]] (T1)   |
  * | `transform_pol_data`       | [[transform]]             |
  * | `save_to_metadata_folder`  | [[saveToMetadataFolder]]  |
  * | `save_summary_report`      | [[saveSummaryReport]]     |
  */
object PolPipeline {

  /** Scan + parse every `.pol` under `root` (S1/S3/S4 + P1). */
  def extractAll(spark: SparkSession, root: String,
      base: Option[String] = None): DataFrame =
    PolParser.read(spark, root, base)

  /** File inventory (S1 at file granularity): includes 0-byte and
    * all-unparseable files, which the line-level parse cannot surface.
    */
  def listFiles(spark: SparkSession, root: String,
      base: Option[String] = None): DataFrame =
    PolParser.listFiles(spark, root, base)

  /** Full transform stage: metrics + classification + nested documents
    * (P2–P8, J1, A1–A6). Pass the [[listFiles]] inventory so files with
    * no parseable rows still emit size-0 documents (reference parity).
    */
  def transform(parsed: DataFrame, dim: DataFrame,
      processedAt: Option[String] = None,
      files: Option[DataFrame] = None): DataFrame =
    PoolMetrics.documents(PoolMetrics.perPool(parsed, dim, files), processedAt)

  /** Changed-files mode (S2/T1): process only files the checkpoint has
    * not seen, upserting into the consolidated JSON. Returns the number
    * of newly processed files. NEW paths only — Spark's file source
    * never re-emits a path, so use [[processChangedLedger]] when
    * in-place modifications must be reprocessed.
    */
  def processChanged(spark: SparkSession, root: String, lookupCsv: String,
      outputFile: Path, checkpointDir: String,
      processedAt: Option[String] = None): Long =
    graft.streaming.IncrementalPol.runOnce(
      spark, root, lookupCsv, outputFile, checkpointDir, processedAt)

  /** Changed-files mode with the reference's full git-diff semantics:
    * NEW and MODIFIED files (size/mtime moved) are reprocessed and
    * their documents replaced; detection is a metadata-only
    * inventory-vs-ledger anti-join.
    */
  def processChangedLedger(spark: SparkSession, root: String,
      lookupCsv: String, outputFile: Path, ledgerPath: String,
      processedAt: Option[String] = None): Long =
    graft.streaming.ChangedFiles.runOnce(
      spark, root, lookupCsv, outputFile, ledgerPath, processedAt)

  /** S6/J2: upsert collected documents into the consolidated JSON. */
  def saveToMetadataFolder(docs: Seq[Row], outputFile: Path): Int =
    PoolJsonSink.upsert(docs, outputFile)

  /** S7: write the run summary. */
  def saveSummaryReport(summary: PoolJsonSink.JObj, outputFile: Path): Unit =
    PoolJsonSink.writeSummary(summary, outputFile)
}
