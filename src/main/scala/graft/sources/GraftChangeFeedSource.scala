package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => ConnectorOffset}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.pol.{ChangeFeed, PoolJsonSink}

/** Committed-version offset for the change-feed stream: the offset
  * axis IS the table's manifest version line. JSON form is just the
  * version number, so checkpoint recovery round-trips trivially.
  */
case class VersionOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

/** `spark.readStream.format("graft")` — the manifest table's change
  * feed as a genuine Structured Streaming source, completing the
  * platform loop: foreachBatch + mergeDelta streams INTO the keyed
  * table (t6), and this streams OUT of it — every committed version
  * becomes a micro-batch of row-level `_change_type`-tagged changes
  * for any downstream sink (an index refresh, a replica, a dedup
  * history append), with offsets checkpointed by the engine.
  *
  * Scale/consistency properties, all inherited from the derived feed:
  *   - offsets are committed VERSIONS — immutable once published, so
  *     a batch's contents are reproducible at any retry (the
  *     replay-determinism Structured Streaming requires of a source);
  *   - each micro-batch reads only buckets whose manifest file sets
  *     changed in its version range ([[ChangeFeed.readTableChanges]]),
  *     so per-batch cost tracks the delta, never the table;
  *   - vacuum retention is the replay horizon: a checkpoint older
  *     than the oldest retained manifest fails loudly rather than
  *     silently skipping changes.
  *
  * Options: `changeKey` (required — the table's merge key column),
  * `startingVersion` (default 0 = genesis: the first batch delivers
  * the current snapshot as inserts; pass the current version to start
  * "latest"), `maxVersionsPerTrigger` (admission control: cap each
  * micro-batch at N versions so a stream catching up over a long
  * commit backlog doesn't plan one giant batch). The table must have
  * at least one committed version when the stream starts (the schema
  * comes from its manifest).
  *
  * Trigger.AvailableNow is supported the way FileStreamSource does
  * it: [[prepareForTriggerAvailableNow]] fences the version line at
  * trigger time, so commits racing the drain are left for the next
  * run instead of extending this one unboundedly.
  */
class GraftChangeFeedSource(
    sqlContext: SQLContext,
    path: String,
    keyCol: String,
    startVersion: Long,
    maxVersionsPerTrigger: Option[Long] = None)
  extends Source with SupportsTriggerAvailableNow {

  private def spark = sqlContext.sparkSession

  // the version line frozen at AvailableNow trigger time (None for
  // continuous triggers — always chase the head)
  @volatile private var fence: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    fence = PoolJsonSink.readManifest(path).map(_.version)
    ()
  }

  // resolved once at stream start — the stream's fixed schema, like
  // any file stream's (additive table evolution mid-stream surfaces
  // on restart, not mid-batch)
  override val schema: StructType =
    GraftChangeFeedSource.changesSchema(sqlContext, path, keyCol)

  private def versionOf(o: ConnectorOffset): Long = o match {
    case VersionOffset(v) => v
    case other => other.json.trim.toLong // SerializedOffset on recovery
  }

  /** Highest committed version within the fence, past the start. */
  private def available: Option[Long] =
    PoolJsonSink.readManifest(path).map(_.version)
      .map(v => fence.fold(v)(math.min(v, _)))
      .filter(_ > startVersion)

  override def getOffset: Option[Offset] =
    available.map(VersionOffset(_))

  /** Admission-controlled head: at most `maxVersionsPerTrigger`
    * versions past what the last batch ended at. `null` (the
    * connector contract) when nothing new is admitted.
    */
  override def latestOffset(
      start: ConnectorOffset, limit: ReadLimit): ConnectorOffset = {
    val from = Option(start).map(versionOf).getOrElse(startVersion)
    available match {
      case Some(v) =>
        val capped = maxVersionsPerTrigger.fold(v)(m => math.min(v, from + m))
        if (capped > from) VersionOffset(capped) else null
      case None => null
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startVersion)
    val to = versionOf(end)
    val changes = ChangeFeed.readTableChanges(
      spark, path, from, to, col(keyCol))
    // v1-source contract: the returned frame must be streaming-tagged
    org.apache.spark.sql.GraftColumnBridge.streamingDataFrame(
      sqlContext, changes.queryExecution.toRdd, changes.schema)
  }

  override def stop(): Unit = ()
}

object GraftChangeFeedSource {
  /** The feed's schema for a table: its current columns (minus the
    * internal `__pt`) + `_change_type` + `_commit_version`. Derived
    * from an empty same-version diff so it matches `getBatch` exactly.
    */
  def changesSchema(
      sqlContext: SQLContext, path: String, keyCol: String): StructType = {
    val m = PoolJsonSink.readManifest(path).getOrElse(sys.error(
      s"graft change-feed stream requires an existing manifest table " +
        s"(no committed version at $path)"))
    ChangeFeed.readTableChanges(
      sqlContext.sparkSession, path, m.version, m.version, col(keyCol))
      .schema
  }
}
