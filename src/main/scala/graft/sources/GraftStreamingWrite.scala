package graft.sources

import org.apache.hadoop.mapreduce.Job

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.util.SerializableConfiguration

import graft.pol.PoolJsonSink

/** `writeStream.toTable("gcat.default.t")` — streaming INTO a keyed
  * graft table by name, as a real DSv2 [[StreamingWrite]]: each
  * micro-batch epoch becomes ONE transactional keyed MERGE (Complete
  * output mode: one whole-table replace), the exact t6 foreachBatch +
  * `mergeDelta` recipe promoted to a first-class sink so `.toTable`
  * / `.format` users need no Scala closure.
  *
  * Mechanics: executors stream rows into per-bucket staged parquet
  * through the SAME [[GraftDataWriterFactory]] the batch row-level
  * write uses (placement computed per row with the table's own
  * `pmod(xxhash64(key), n)` — one file per touched bucket per task);
  * the driver's `commit(epochId, _)` reads the staged files back and
  * runs the table's native upsert, which re-places identically (the
  * exchange is epoch-sized) and publishes through the one CAS
  * manifest commit every producer shares.
  *
  * Exactly-once: Structured Streaming re-runs `commit` for an epoch
  * whose completion was lost — a marker file under `_stream_epochs/`
  * (tmp+atomic-move, keyed by queryId+epochId) makes the re-run a
  * no-op instead of a duplicate merge. Duplicate EXECUTIONS of the
  * epoch's tasks are already safe: staged files are uniquely named
  * and only the files named in the driver's commit messages are
  * merged; `abort` sweeps the rest (and the vacuum v2stage sweep
  * catches a crashed driver's leftovers).
  */
class GraftStreamingWrite(
    ident: String, tableDir: String, logicalSchema: StructType,
    incoming: StructType, keyCol: String, nBuckets: Int,
    replace: Boolean, queryId: String)
  extends StreamingWrite {

  private val stageRel =
    s".v2stream-${java.util.UUID.randomUUID().toString.take(8)}"

  private val fileSchema = StructType(
    logicalSchema.fields.filterNot(_.name == GraftSpjTable.BucketCol)
      :+ StructField(GraftSpjTable.BucketCol, LongType, nullable = false))

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf: OutputWriterFactory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, fileSchema)
    new java.io.File(tableDir, stageRel).mkdirs()
    val f = GraftDataWriterFactory(
      tableDir, stageRel, incoming, fileSchema, keyCol, nBuckets,
      owf, new SerializableConfiguration(job.getConfiguration))
    (partitionId: Int, taskId: Long, _: Long) =>
      f.createWriter(partitionId, taskId)
  }

  private def marker(epochId: Long): java.io.File = {
    val d = new java.io.File(tableDir, "_stream_epochs")
    d.mkdirs()
    new java.io.File(d, s"$queryId-$epochId")
  }

  override def commit(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.flatMap {
      case GraftWriteCommit(files) => files.map(_._2)
    }
    try {
      if (marker(epochId).isFile) return // recovered re-commit: done
      val spark = SparkSession.active
      val kc = org.apache.spark.sql.functions.col(keyCol)
      val delta =
        if (staged.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(fileSchema.fields.filterNot(
              _.name == GraftSpjTable.BucketCol)))
        else spark.read
          .parquet(staged.map(n => s"$tableDir/$stageRel/$n").toSeq: _*)
          .drop(GraftSpjTable.BucketCol)
      if (replace)
        PoolJsonSink.overwritePartitioned(spark, tableDir, delta, kc, nBuckets)
      else if (staged.nonEmpty)
        PoolJsonSink.upsertPartitioned(spark, tableDir, delta, kc, nBuckets)
      // publish the epoch marker AFTER the merge committed: a crash
      // between the two re-runs the merge (idempotent per epoch — the
      // same delta merges to the same table state, one extra version)
      val tmp = java.io.File.createTempFile(
        s"$queryId-$epochId", ".tmp", marker(epochId).getParentFile)
      java.nio.file.Files.move(tmp.toPath, marker(epochId).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    } finally cleanupStage()
  }

  override def abort(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    cleanupStage()

  private def cleanupStage(): Unit = {
    val d = new java.io.File(tableDir, stageRel)
    Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    d.delete(); ()
  }

  override def toString: String = s"GraftStreamingWrite($ident)"
}
