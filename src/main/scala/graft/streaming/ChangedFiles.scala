package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pol.{GameLookup, PolParser, PoolJsonSink, PoolMetrics}

/** S2 — the reference's changed-files detection (`etl/extract.py:161-211`
  * drives it from `git diff`: files that are NEW **or MODIFIED** since
  * the last run are reprocessed and their documents replace the old
  * entries via the keyed upsert).
  *
  * The streaming-checkpoint variant ([[IncrementalPol]]) gives
  * exactly-once per PATH — Spark's file source never re-emits a path,
  * so an in-place modification is invisible to it. This ledger variant
  * matches the reference: the processed-state is an explicit relation
  * `(relative_path, size_bytes, modified_ts)` and the changed set is a
  * LEFT-ANTI join of the current inventory against it — new paths AND
  * any path whose size or mtime moved. Both the inventory
  * ([[PolParser.listFiles]]) and the ledger are metadata-only: the
  * detection cost is a listing sweep, never a data scan, so it holds at
  * millions of files.
  */
object ChangedFiles {

  /** Current-inventory rows absent from the ledger (new or modified). */
  def detect(inventory: DataFrame, ledger: DataFrame): DataFrame =
    inventory.join(ledger,
      Seq("relative_path", "size_bytes", "modified_ts"), "left_anti")

  /** Load the ledger relation (empty on first run). */
  def loadLedger(spark: SparkSession, path: String): DataFrame = {
    val f = new java.io.File(path)
    if (f.exists())
      spark.read.parquet(path)
        .select("relative_path", "size_bytes", "modified_ts")
    else
      spark.createDataFrame(
        java.util.List.of[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("relative_path",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("size_bytes",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("modified_ts",
            org.apache.spark.sql.types.TimestampType))))
  }

  /** Parse + transform exactly the files of `changed` (an inventory
    * subset) and upsert their documents. Shared by the ledger mode and
    * the git-diff mode — the discovery strategy is the only thing that
    * differs between them.
    */
  private def processChangedSet(
      spark: SparkSession,
      root: String,
      changed: DataFrame,
      lookupPath: String,
      outputFile: java.nio.file.Path,
      processedAt: Option[String]): Long = {
    val n = changed.count()
    if (n > 0) {
      // scan only the changed files: the text source takes an explicit
      // path list, so unchanged files are never opened
      val base = new java.io.File(root).getAbsolutePath.stripSuffix("/")
      val paths = changed.select("relative_path").collect()
        .map(r => s"$base/${r.getString(0)}")
      val raw = spark.read
        .option("pathGlobFilter", "*.pol")
        .text(paths: _*)
        .select(col("value"),
          col("_metadata.file_path").as("abs_path"),
          col("_metadata.file_name").as("file_name"),
          col("_metadata.file_size").as("size_bytes"),
          col("_metadata.file_modification_time").as("modified_ts"))
      val withMeta = PolParser.pathMeta(raw, base)
      val parsed = PolParser.parse(withMeta)
      val dim = GameLookup.load(spark, lookupPath)
      val files = changed
        .select("relative_path", "file_name", "folder_path", "parent_folder")
      val docs = PoolMetrics.documents(
        PoolMetrics.perPool(parsed, dim, Some(files)), processedAt)
        .collect().toSeq
      PoolJsonSink.upsert(docs, outputFile)
    }
    n
  }

  /** One changed-files run: list → diff against the ledger → parse +
    * transform ONLY the changed files → upsert their documents → write
    * the new ledger (current inventory, so deletes age out). Returns
    * the number of files processed.
    */
  def runOnce(
      spark: SparkSession,
      root: String,
      lookupCsv: String,
      outputFile: java.nio.file.Path,
      ledgerPath: String,
      processedAt: Option[String] = None): Long = {
    val inventory = PolParser.listFiles(spark, root)
    val ledger = loadLedger(spark, ledgerPath)
    val changed = detect(inventory, ledger).cache()
    val n = processChangedSet(
      spark, root, changed, lookupCsv, outputFile, processedAt)
    // new ledger = full current inventory (atomic swap via temp dir)
    val tmp = ledgerPath + "__tmp"
    inventory.select("relative_path", "size_bytes", "modified_ts")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val target = new java.io.File(ledgerPath)
    if (target.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(target)
    }
    new java.io.File(tmp).renameTo(target)
    changed.unpersist()
    n
  }

  /** The reference's LITERAL discovery mode (`etl/extract.py:161-211`):
    * `git diff --name-only <from> <to>` on the repo, keep `.pol` paths
    * under `subdir`, drop paths that no longer exist (deleted files,
    * `etl/extract.py:186-189`). Driver-side subprocess by design — a
    * CI-repo diff is thousands of paths, not a data-scale problem; the
    * ledger mode above is the engine-native formulation of the same
    * semantics for corpora that do not live in git. Returned paths are
    * repo-relative.
    */
  def gitChangedFiles(
      repoRoot: String,
      subdir: String = "samples/pools2",
      from: String = "HEAD~1",
      to: String = "HEAD"): Seq[String] = {
    import scala.sys.process._
    val out = Seq("git", "-C", repoRoot, "diff", "--name-only", from, to).!!
    out.linesIterator
      .map(_.trim)
      .filter(p => p.nonEmpty && p.endsWith(".pol"))
      .filter(p => subdir.isEmpty || p.startsWith(subdir + "/"))
      .filter(p => new java.io.File(repoRoot, p).exists())
      .toSeq
  }

  /** One git-diff-driven run — the drop-in CI replacement for the
    * reference's incremental mode: changed `.pol` files since the last
    * commit are reprocessed and upserted; an EMPTY diff falls back to
    * the full scan, exactly the reference's fallback
    * (`etl/main.py:82-85`). Returns the number of files processed.
    */
  def runGit(
      spark: SparkSession,
      repoRoot: String,
      subdir: String,
      lookupPath: String,
      outputFile: java.nio.file.Path,
      from: String = "HEAD~1",
      to: String = "HEAD",
      processedAt: Option[String] = None): Long = {
    val root = new java.io.File(repoRoot, subdir).getAbsolutePath
    val inventory = PolParser.listFiles(spark, root)
    val wanted = gitChangedFiles(repoRoot, subdir, from, to)
      .map(_.stripPrefix(subdir + "/"))
    val changed =
      if (wanted.isEmpty) inventory // empty diff → full scan fallback
      else inventory.where(col("relative_path").isin(wanted: _*))
    processChangedSet(spark, root, changed, lookupPath, outputFile, processedAt)
  }
}
