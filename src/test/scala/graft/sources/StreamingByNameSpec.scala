package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.QueryHarness.spark
import graft.pol.PoolJsonSink

/** The main table's streaming faces BY NAME:
  * `spark.readStream.table("g.default.t")` = the append face (post-
  * image rows, deletes fail loudly unless ignored), and
  * `df.writeStream.toTable("g.default.t")` = the per-epoch keyed
  * merge. Together they close the platform loop in pure name-based
  * API — no paths, no format strings, no foreachBatch closures.
  */
class StreamingByNameSpec extends AnyFunSuite {
  import spark.implicits._

  private val wh =
    java.nio.file.Files.createTempDirectory("graft_sbnwh").toString
  spark.conf.set("spark.sql.catalog.gsn", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gsn.warehouse", wh)

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("readStream.table delivers endpoint-collapsed post-images; " +
    "a delete fails the stream; ignoreDeletes skips it") {
    spark.sql("CREATE TABLE gsn.default.src (k STRING, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='2')")
    val dir = s"$wh/default/src"
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("a", "1"), ("b", "1")).toDF("k", "v"), col("k"), nBuckets = 2)
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("a", "2"), ("c", "1")).toDF("k", "v"), col("k"), nBuckets = 2)

    val ckpt = freshDir("graft_sbn_ckpt")
    val sink = freshDir("graft_sbn_sink")
    def drain(ignoreDeletes: Boolean): Unit = {
      val q = spark.readStream
        .option("ignoreDeletes", ignoreDeletes.toString)
        .table("gsn.default.src")
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain(ignoreDeletes = false)
    val got = spark.read.parquet(sink).as[(String, String)].collect().toSet
    // schema is the TABLE schema (no _change_type), and the batch is
    // the ENDPOINT collapse of its version range: one row per key —
    // the intermediate a=1 never surfaces, only the snapshot-current
    // post-images do
    assert(spark.read.parquet(sink).columns.toSeq == Seq("k", "v"))
    assert(got == Set(("a", "2"), ("b", "1"), ("c", "1")))

    // a delete poisons the feed for an append consumer: loud failure
    PoolJsonSink.deletePartitioned(spark, dir,
      Seq("b").toDF("k"), col("k"), nBuckets = 2)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(ignoreDeletes = false)
    }
    assert(ex.getMessage.contains("ignoreDeletes") ||
      Option(ex.getCause).exists(_.getMessage.contains("ignoreDeletes")))

    // opted in: the delete is skipped, later changes still arrive
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("d", "1")).toDF("k", "v"), col("k"), nBuckets = 2)
    drain(ignoreDeletes = true)
    val after = spark.read.parquet(sink).as[(String, String)].collect().toSet
    assert(after == got + (("d", "1")))
  }

  test("writeStream.toTable merges each epoch into the keyed table") {
    spark.sql("CREATE TABLE gsn.default.dst (k STRING, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='2')")
    val src = freshDir("graft_sbn_src")
    Seq(("a", "1"), ("b", "1")).toDF("k", "v")
      .write.mode("append").json(src)

    val ckpt = freshDir("graft_sbn_wckpt")
    def drain(): Unit = {
      val q = spark.readStream
        .schema("k STRING, v STRING").json(src)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("gsn.default.dst")
      q.awaitTermination()
    }
    drain()
    assert(spark.table("gsn.default.dst").as[(String, String)]
      .collect().toSet == Set(("a", "1"), ("b", "1")))

    // a second file: the new epoch merges (upsert on k) — 'a' updates
    // in place, 'c' inserts, and the table never duplicates a key
    Seq(("a", "2"), ("c", "1")).toDF("k", "v")
      .write.mode("append").json(src)
    drain()
    val rows = spark.table("gsn.default.dst").as[(String, String)]
      .collect().toSet
    assert(rows == Set(("a", "2"), ("b", "1"), ("c", "1")))
    assert(spark.table("gsn.default.dst").groupBy("k").count()
      .where(col("count") > 1).count() == 0)

    // an idle re-run commits nothing new
    val before = PoolJsonSink.readManifest(s"$wh/default/dst").get.version
    drain()
    assert(PoolJsonSink.readManifest(s"$wh/default/dst").get.version
      == before)
  }

  test("Update output mode: a streaming aggregation merges its " +
    "updated groups into the keyed table") {
    spark.sql("CREATE TABLE gsn.default.agg (k STRING, n BIGINT) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='2')")
    val src = freshDir("graft_sbn_upd")
    Seq("a", "a", "b").toDF("k").write.mode("append").json(src)
    val ckpt = freshDir("graft_sbn_upd_ckpt")
    def drain(): Unit = {
      val q = spark.readStream.schema("k STRING").json(src)
        .groupBy("k").count().withColumnRenamed("count", "n")
        .writeStream
        .outputMode("update") // update-as-append = the keyed MERGE
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("gsn.default.agg")
      q.awaitTermination()
    }
    drain()
    assert(spark.table("gsn.default.agg").as[(String, Long)]
      .collect().toSet == Set(("a", 2L), ("b", 1L)))
    // more input: only the UPDATED groups re-emit and merge in place
    Seq("a", "c").toDF("k").write.mode("append").json(src)
    drain()
    assert(spark.table("gsn.default.agg").as[(String, Long)]
      .collect().toSet == Set(("a", 3L), ("b", 1L), ("c", 1L)))
  }

  test("epoch markers are retention-gated: vacuum with no age never " +
    "touches them, an aged vacuum reclaims them") {
    val dir = s"$wh/default/dst" // written by the toTable test
    val markers = new java.io.File(dir, "_stream_epochs")
    assume(markers.isDirectory && markers.listFiles().nonEmpty)
    val before = markers.listFiles().length
    PoolJsonSink.vacuum(dir, retainVersions = 100, minAgeMs = 0L)
    // minAge 0 = the aggressive test default: markers survive — a
    // LIVE query could still re-commit those epochs
    assert(markers.listFiles().length == before)
    PoolJsonSink.vacuum(dir, retainVersions = 100, minAgeMs = 1L)
    assert(Option(markers.listFiles()).getOrElse(Array.empty).isEmpty)
  }

  test("read and write by name compose: table-to-table streaming " +
    "replication through the changes feed") {
    spark.sql("CREATE TABLE gsn.default.rsrc (k STRING, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='2')")
    spark.sql("CREATE TABLE gsn.default.rdst (k STRING, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='2')")
    val srcDir = s"$wh/default/rsrc"
    PoolJsonSink.upsertPartitioned(spark, srcDir,
      Seq(("a", "1"), ("b", "1")).toDF("k", "v"), col("k"), nBuckets = 2)
    PoolJsonSink.upsertPartitioned(spark, srcDir,
      Seq(("a", "2")).toDF("k", "v"), col("k"), nBuckets = 2)

    val ckpt = freshDir("graft_sbn_rep")
    val q = spark.readStream
      .table("gsn.default.rsrc")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .toTable("gsn.default.rdst")
    q.awaitTermination()
    assert(spark.table("gsn.default.rdst").as[(String, String)]
      .collect().toSet == Set(("a", "2"), ("b", "1")))
  }
}
