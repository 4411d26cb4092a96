package graft.streaming

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.QueryHarness.spark
import graft.pol.PoolJsonSink

/** T6's maintenance loop, pinned at the file level: delta-driven MERGE
  * must cost O(delta + touched buckets) per micro-batch, never
  * O(table). The observable contract: a batch whose keys hash into one
  * bucket leaves every other bucket's data files byte-identical on
  * disk (names, sizes, mtimes) AND unchanged in the manifest — the
  * reference's O(total) read-modify-write (etl/load.py:35-78) made
  * incremental. Compaction every 2 batches bounds per-bucket file
  * count, and the finished table always equals the one-shot batch
  * aggregate (maintenance invariance).
  */
class StreamUpsertSpec extends AnyFunSuite {
  import spark.implicits._

  private val nBuckets = 8

  /** One t6-shaped maintenance step over a (user_id, value) delta. */
  private def step(table: String, batch: DataFrame): Seq[Long] = {
    val delta = batch.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      sum(col("value").cast("decimal(18,2)"))
        .cast("decimal(38,2)").as("sum_value_dec"))
    PoolJsonSink.mergeDelta(
      spark, table, delta, col("user_id"), nBuckets)(
      _.groupBy("user_id").agg(
        sum(col("n_events")).as("n_events"),
        sum(col("sum_value_dec")).cast("decimal(38,2)")
          .as("sum_value_dec")))
  }

  private def fingerprint(dir: String): Map[String, (Long, Long)] =
    PoolJsonSink.readManifest(dir).get.files.map { rel =>
      val f = new File(dir, rel)
      rel -> ((f.length(), f.lastModified()))
    }.toMap

  test("a one-bucket micro-batch leaves all other buckets byte-identical") {
    val table = java.nio.file.Files.createTempDirectory("graft_su1")
      .resolve("tbl").toString
    // seed: users spread over all buckets
    step(table, (0 until 200).map(i => (s"u$i", i * 1.0)).toDF("user_id", "value"))
    val before = PoolJsonSink.readManifest(table).get
    val beforeFp = fingerprint(table)
    assert(before.buckets.size == nBuckets, "seed should fill every bucket")

    // micro-batch hitting exactly one key -> exactly one bucket
    val touched = step(table, Seq(("u7", 100.0)).toDF("user_id", "value"))
    assert(touched.size == 1)
    val hot = touched.head

    val after = PoolJsonSink.readManifest(table).get
    (before.buckets.keySet - hot).foreach { b =>
      assert(after.buckets(b) == before.buckets(b),
        s"bucket $b rewritten by a batch that never touched it")
      after.buckets(b).foreach { rel =>
        val f = new File(table, rel)
        assert(f.exists() && (f.length(), f.lastModified()) == beforeFp(rel),
          s"file $rel of untouched bucket $b modified")
      }
    }
    assert(after.buckets(hot) != before.buckets(hot))

    // and the merge actually merged: u7 combined, neighbors intact
    val got = PoolJsonSink.readTable(spark, table)
      .select(col("user_id"), col("n_events"),
        col("sum_value_dec").cast("double").as("sv"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("u7") == ((2L, 107.0)))
    assert(got("u8") == ((1L, 8.0)))
    assert(got.size == 200)
  }

  test("8 batches with compact-every-2 stay under 2 files per bucket " +
      "and equal the one-shot aggregate") {
    val table = java.nio.file.Files.createTempDirectory("graft_su2")
      .resolve("tbl").toString
    val batches = (0 until 8).map { b =>
      (0 until 100).map(i => (s"u${(i * 7 + b) % 120}", (b * 100 + i) * 1.0))
    }
    batches.zipWithIndex.foreach { case (rows, id) =>
      step(table, rows.toDF("user_id", "value"))
      if ((id + 1) % 2 == 0) {
        PoolJsonSink.compactPartitions(spark, table, maxFilesPerPartition = 2)
        PoolJsonSink.vacuum(table)
      }
    }
    val m = PoolJsonSink.readManifest(table).get
    m.buckets.foreach { case (b, fs) =>
      assert(fs.size <= 2, s"bucket $b accreted ${fs.size} files")
    }
    // no unreferenced garbage survives a vacuum'd loop
    assert(PoolJsonSink.vacuum(table) == 0)

    // maintenance invariance: equals the one-shot batch aggregate
    val all = batches.flatten.toDF("user_id", "value")
    val expect = all.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val got = PoolJsonSink.readTable(spark, table)
      .select(col("user_id"), col("n_events"),
        col("sum_value_dec").cast("double").as("sv"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expect)
  }
}
