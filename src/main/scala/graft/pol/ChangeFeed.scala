package graft.pol

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pol.PoolJsonSink.TableManifest

/** Row-level change feed over a manifest-committed table — the Delta
  * CDF / Iceberg changelog analog, derived rather than logged.
  *
  * The manifest already records everything a change feed needs: each
  * commit replaces whole buckets, data files are immutable, and a
  * bucket whose file list is IDENTICAL between two versions cannot
  * contain a changed row. So the diff of version N → N+1 reads ONLY
  * the buckets whose file sets differ (for both snapshots), joins old
  * vs new on the table key, and classifies:
  *
  *   - key only in new                → `insert`
  *   - key only in old                → `delete`
  *   - key in both, row bytes differ  → `update_preimage` (old row)
  *                                      + `update_postimage` (new row)
  *
  * Rows that merely live in a rewritten bucket but did not change are
  * killed by the null-safe struct comparison — bucket granularity
  * bounds the READ cost, key granularity defines the OUTPUT.
  *
  * Scale: a trickle upsert into a 100 TB table touches a handful of
  * buckets, so its change feed reads a handful of bucket files — cost
  * tracks the size of the CHANGE, never the table. This is what makes
  * incremental downstream consumers (index refresh, dedup-history
  * append, replication) O(delta): they chain from the feed instead of
  * re-scanning the table. No separate log is written or kept in sync —
  * the committed manifests ARE the log (and [[PoolJsonSink.vacuum]]'s
  * retention window is exactly the feed's replay horizon).
  *
  * Reference anchor: the reference keeps a processed-files ledger and
  * re-derives "what changed" by comparing against it
  * (etl/extract.py:161-211); this is that idea applied to ROWS of the
  * keyed store, with the manifest versions as the ledger.
  */
object ChangeFeed {

  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  /** Bucket ids whose file sets differ between two manifests — the
    * only buckets a version diff must read.
    */
  def changedBuckets(m0: TableManifest, m1: TableManifest): Seq[Long] =
    (m0.buckets.keySet ++ m1.buckets.keySet).toSeq.sorted.filter { b =>
      m0.buckets.getOrElse(b, Nil).toSet != m1.buckets.getOrElse(b, Nil).toSet
    }

  /** Null-fill `df` up to the union of its columns with `other`'s (the
    * additive-schema-evolution case: rows written before a new column
    * existed diff as NULL in it), returning columns in a canonical
    * order so both sides' structs compare field-by-field.
    */
  private def aligned(df: DataFrame, other: DataFrame): DataFrame = {
    val cols = (df.columns ++ other.columns).distinct.sorted.toSeq
    df.unionByName(other.limit(0), allowMissingColumns = true)
      .select(cols.map(col): _*)
  }

  /** The row-level diff of two resolved snapshots (`m0` may be None —
    * the genesis diff, where every row of `m1` is an insert). Output =
    * table columns (minus the internal `__pt`) + [[ChangeTypeCol]] +
    * [[CommitVersionCol]] (= `m1.version`).
    */
  private def diffPair(
      spark: SparkSession, tableDir: String,
      m0: Option[TableManifest], m1: TableManifest,
      key: Column): DataFrame = {
    val empty = TableManifest(0L, Map.empty, Map.empty, m1.schemaJson)
    val base = m0.getOrElse(empty)
    val changed = changedBuckets(base, m1)
    val oldRaw = PoolJsonSink
      .readBucketsOf(spark, tableDir, base, changed).drop("__pt")
    val newRaw = PoolJsonSink
      .readBucketsOf(spark, tableDir, m1, changed).drop("__pt")
    val oldDf = aligned(oldRaw, newRaw)
    val newDf = aligned(newRaw, oldRaw)
    val cols = newDf.columns.toSeq
    val o = oldDf.select(key.as("__ck"), struct(cols.map(col): _*).as("__o"))
    val n = newDf.select(key.as("__ck"), struct(cols.map(col): _*).as("__n"))
    val ct = when(col("__n").isNull, lit("delete"))
      .when(col("__o").isNull, lit("insert"))
      .when(!(col("__o") <=> col("__n")), lit("update"))
    val j = o.join(n, Seq("__ck"), "full_outer")
      .withColumn("__ct", ct)
      .where(col("__ct").isNotNull)
    // updates fan out to preimage + postimage (the Delta CDF contract:
    // a consumer maintaining a downstream aggregate needs the OLD row
    // to retract and the NEW row to apply)
    val images = j.select(col("__o"), col("__n"),
      explode(when(col("__ct") === "update",
        array(lit("update_preimage"), lit("update_postimage")))
        .otherwise(array(col("__ct")))).as(ChangeTypeCol))
    val src = when(
      col(ChangeTypeCol).isin("delete", "update_preimage"),
      col("__o")).otherwise(col("__n"))
    images.select(
      cols.map(c => src.getField(c).as(c)) :+
        col(ChangeTypeCol) :+
        lit(m1.version).as(CommitVersionCol): _*)
  }

  /** Changes committed in versions (`fromVersion`, `toVersion`] — the
    * half-open Delta CDF convention: `fromVersion` is the snapshot the
    * consumer already has, and `fromVersion = 0` replays from genesis.
    *
    * `perVersion = true` (default) diffs each adjacent committed pair
    * still on disk and tags rows with the version that changed them —
    * full fidelity, cost proportional to the sum of the per-commit
    * deltas. `perVersion = false` diffs only the two endpoint
    * snapshots — cheaper when many commits rewrote the same keys
    * (intermediate churn collapses), all rows tagged `toVersion`.
    *
    * `key` follows [[PoolJsonSink.mergeDelta]]'s contract: an
    * unresolved column expression valid on the stored schema. Versions
    * inside the range already reclaimed by vacuum fold into the next
    * surviving version's diff; a reclaimed `fromVersion`/`toVersion`
    * endpoint fails loudly (the replay horizon is the retention
    * window).
    */
  def readTableChanges(
      spark: SparkSession, tableDir: String,
      fromVersion: Long, toVersion: Long,
      key: Column, perVersion: Boolean = true): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion > toVersion $toVersion")
    val mTo = PoolJsonSink.readManifestAt(tableDir, toVersion)
    val mFrom: Option[TableManifest] =
      if (fromVersion == 0L) None
      else Some(PoolJsonSink.readManifestAt(tableDir, fromVersion))
    if (fromVersion == toVersion)
      diffPair(spark, tableDir, Some(mTo), mTo, key) // empty, right schema
    else if (!perVersion) diffPair(spark, tableDir, mFrom, mTo, key)
    else {
      val onDisk = PoolJsonSink.listVersions(tableDir)
        .filter(v => v > fromVersion && v <= toVersion)
      val steps = onDisk.foldLeft(
        (mFrom, Seq.empty[DataFrame])) { case ((prev, acc), v) =>
        val m = if (v == toVersion) mTo
          else PoolJsonSink.readManifestAt(tableDir, v)
        (Some(m), acc :+ diffPair(spark, tableDir, prev, m, key))
      }._2
      steps.reduce(_.unionByName(_))
    }
  }

  /** Durable-cursor incremental consumption: deliver each committed
    * version's changes to `f` exactly once per successful run, with
    * the cursor advanced via atomic tmp+move AFTER `f` returns.
    *
    * Crash between `f` and the cursor write re-delivers that version
    * on restart (at-least-once); `f` must be idempotent per version —
    * the same contract Structured Streaming's foreachBatch has for
    * batchId, and the t6 marker-file recipe satisfies it. Returns the
    * versions delivered this call. A missing cursor file starts at
    * `startVersion` (0 = genesis, so the first delivery is the full
    * snapshot as inserts; pass the current version to start "latest").
    */
  def processNewVersions(
      spark: SparkSession, tableDir: String, cursorFile: String,
      key: Column, startVersion: Long = 0L)(
      f: (DataFrame, Long) => Unit): Seq[Long] = {
    val cf = new java.io.File(cursorFile)
    val cursor =
      if (cf.isFile)
        new String(Files.readAllBytes(cf.toPath), StandardCharsets.UTF_8)
          .trim.toLong
      else startVersion
    val pending = PoolJsonSink.listVersions(tableDir).filter(_ > cursor)
    pending.foldLeft(cursor) { (prev, v) =>
      f(readTableChanges(spark, tableDir, prev, v, key), v)
      val tmp = new java.io.File(cf.getParentFile, s".${cf.getName}.tmp")
      Files.write(tmp.toPath, s"$v\n".getBytes(StandardCharsets.UTF_8))
      Files.move(tmp.toPath, cf.toPath, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
      v
    }
    pending
  }
}
