package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.QueryHarness.spark
import graft.pol.PoolJsonSink

/** The write faces of format("graft"): batch DataFrameWriter modes
  * mapping onto keyed MERGE / atomic replace, and the streaming sink
  * packaging the t6 foreachBatch recipe (keyed upsert per micro-batch,
  * persisted batch-id idempotence, optional inline compaction).
  */
class GraftWriteSpec extends AnyFunSuite {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def tableRows(dir: String): Map[String, String] =
    PoolJsonSink.readTable(spark, dir)
      .select("k", "payload").as[(String, String)].collect().toMap

  test("batch writer: Append merges by key, Overwrite replaces") {
    val dir = freshDir("graft_w") + "/tbl"
    Seq(("a", "v1a"), ("b", "v1b")).toDF("k", "payload")
      .write.format("graft").option("key", "k").option("nBuckets", "2")
      .mode(SaveMode.Append).save(dir)
    assert(tableRows(dir) == Map("a" -> "v1a", "b" -> "v1b"))

    // append = keyed upsert: a replaced, c inserted, b untouched
    Seq(("a", "v2a"), ("c", "v2c")).toDF("k", "payload")
      .write.format("graft").option("key", "k")
      .mode(SaveMode.Append).save(dir)
    assert(tableRows(dir) == Map("a" -> "v2a", "b" -> "v1b", "c" -> "v2c"))

    // overwrite = atomic whole-table replace, old versions retained
    Seq(("z", "v3z")).toDF("k", "payload")
      .write.format("graft").option("key", "k")
      .mode(SaveMode.Overwrite).save(dir)
    assert(tableRows(dir) == Map("z" -> "v3z"))
    assert(PoolJsonSink.readTableAsOf(spark, dir, 2)
      .count() == 3) // time travel to the pre-overwrite content

    // existence gates
    intercept[RuntimeException] {
      Seq(("x", "x")).toDF("k", "payload").write.format("graft")
        .option("key", "k").mode(SaveMode.ErrorIfExists).save(dir)
    }
    Seq(("x", "x")).toDF("k", "payload").write.format("graft")
      .option("key", "k").mode(SaveMode.Ignore).save(dir)
    assert(tableRows(dir) == Map("z" -> "v3z")) // Ignore was a no-op
  }

  test("write expectations reject a violating batch wholly (CHECK)") {
    val dir = freshDir("graft_expect") + "/tbl"
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
      .write.format("graft").option("key", "k")
      .option("expect.positive", "v >= 0")
      .mode(SaveMode.Append).save(dir)
    val v1 = PoolJsonSink.readManifest(dir).get.version

    // one bad row poisons the batch: NOTHING commits, version frozen
    val e = intercept[IllegalArgumentException] {
      Seq(("c", 3L), ("d", -7L), ("e", -1L)).toDF("k", "v")
        .write.format("graft").option("key", "k")
        .option("expect.positive", "v >= 0")
        .mode(SaveMode.Append).save(dir)
    }
    assert(e.getMessage.contains("positive") &&
      e.getMessage.contains("2 rows"))
    assert(PoolJsonSink.readManifest(dir).get.version == v1)
    assert(PoolJsonSink.readTable(spark, dir).count() == 2)

    // SQL CHECK semantics: a NULL predicate result PASSES
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("f", Option.empty[java.lang.Long])).toDF("k", "v"),
      col("k"), nBuckets = 2,
      expectations = Seq("positive" -> (col("v") >= 0)))
    assert(PoolJsonSink.readTable(spark, dir).count() == 3)
  }

  test("streaming sink: per-batch keyed upsert with idempotent restart") {
    val stage = freshDir("graft_ws_stage")
    val ckpt = freshDir("graft_ws_ckpt")
    val table = freshDir("graft_ws_tbl") + "/tbl"

    // 3 ordered chunk files (explicit mtimes so the file source's
    // batch order is deterministic): k1 written in batch 0, updated
    // in batch 2 — last write must win in the table
    def stageChunk(name: String, mtime: Long,
        rows: Seq[(String, String)]): Unit = {
      rows.toDF("k", "payload").coalesce(1).write.parquet(s"$stage/$name")
      new java.io.File(s"$stage/$name").listFiles()
        .foreach(_.setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    stageChunk("c0", t0, Seq(("k1", "b0"), ("k2", "b0")))
    stageChunk("c1", t0 + 10000, Seq(("k3", "b1")))
    stageChunk("c2", t0 + 20000, Seq(("k1", "b2"), ("k4", "b2")))
    val schema = spark.read.parquet(s"$stage/c0").schema

    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$stage/c*")
        .writeStream
        .format("graft")
        .option("key", "k").option("nBuckets", "2")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(table)
      q.awaitTermination()
    }
    run()
    assert(tableRows(table) == Map(
      "k1" -> "b2", "k2" -> "b0", "k3" -> "b1", "k4" -> "b2"))
    val committed = PoolJsonSink.readManifest(table).get.version

    // restart on the same checkpoint with no new data: the persisted
    // batch marker makes redelivery a no-op — no new table version
    run()
    assert(PoolJsonSink.readManifest(table).get.version == committed)
    assert(tableRows(table) == Map(
      "k1" -> "b2", "k2" -> "b0", "k3" -> "b1", "k4" -> "b2"))
  }
}
