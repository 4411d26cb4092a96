package graft.pol

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.spark

/** S6's scale path: upsertPartitioned must behave like a keyed MERGE
  * (incoming keys replace, everything else survives) AND touch only
  * the partitions its keys hash into — untouched partition
  * directories keep their exact files (names compared, not mtimes:
  * parquet part files get fresh UUID names on any rewrite, so an
  * unchanged listing proves the directory was never rewritten).
  */
class PartitionedUpsertSpec extends AnyFunSuite {

  private def listByPartition(dir: String): Map[String, Set[String]] =
    new File(dir).listFiles().filter(_.isDirectory)
      .map(d => d.getName -> d.listFiles().map(_.getName)
        .filterNot(_.startsWith(".")).toSet)
      .toMap

  test("upsert rewrites only touched partitions, merges by key") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert")
      .resolve("table").toString
    val base = (0 until 100).map(i => (s"key$i", s"v0_$i"))
      .toDF("k", "payload")
    PoolJsonSink.upsertPartitioned(spark, dir, base, col("k"), nBuckets = 8)
    val before = listByPartition(dir)
    assert(before.nonEmpty)

    // update 2 keys, insert 1 new — at most 3 of 8 buckets touched
    val batch = Seq(("key3", "v1_3"), ("key42", "v1_42"), ("key_new", "v1_new"))
      .toDF("k", "payload")
    val touched = PoolJsonSink.upsertPartitioned(
      spark, dir, batch, col("k"), nBuckets = 8)
    assert(touched.nonEmpty && touched.size <= 3)

    val after = listByPartition(dir)
    val touchedDirs = touched.map(b => s"__pt=$b").toSet
    // untouched partitions: identical file listing, byte-for-byte
    // never rewritten
    (before.keySet -- touchedDirs).foreach { p =>
      assert(after(p) == before(p), s"untouched partition $p was rewritten")
    }
    // touched partitions: rewritten (fresh part-file names)
    touchedDirs.filter(before.contains).foreach { p =>
      assert(after(p) != before(p), s"touched partition $p kept stale files")
    }

    // MERGE semantics: 101 keys, updates visible, the rest intact
    val got = spark.read.parquet(dir)
      .select("k", "payload").as[(String, String)].collect().toMap
    assert(got.size == 101)
    assert(got("key3") == "v1_3" && got("key42") == "v1_42")
    assert(got("key_new") == "v1_new")
    assert(got("key7") == "v0_7")
  }

  test("compaction squashes only fat buckets, preserves content") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
      .resolve("table").toString
    val base = (0 until 60).map(i => (s"key$i", s"v0_$i")).toDF("k", "payload")
      .coalesce(1)
    PoolJsonSink.upsertPartitioned(spark, dir, base, col("k"), nBuckets = 4)
    // fatten ONE bucket: a wide-parallelism upsert writes one file per
    // task per touched partition (at cluster scale: hundreds of files
    // per bucket per MERGE batch — exactly the small-files problem)
    val hot = base
      .where(pmod(xxhash64(col("k")), lit(4L)) === 1)
      .withColumn("payload", concat(col("payload"), lit("_u")))
    val touched = PoolJsonSink.upsertPartitioned(spark, dir,
      hot.repartition(12), col("k"), nBuckets = 4)
    assert(touched == Seq(1L))
    val before = listByPartition(dir)
    assert(before("__pt=1").count(_.endsWith(".parquet")) > 4,
      "setup: hot bucket must have accumulated small files")

    val compacted = PoolJsonSink.compactPartitions(spark, dir,
      maxFilesPerPartition = 4)
    assert(compacted == Seq(1L))
    val after = listByPartition(dir)
    // fat bucket: down to one file; all others: byte-identical listing
    assert(after("__pt=1").count(_.endsWith(".parquet")) == 1)
    (before.keySet - "__pt=1").foreach { p =>
      assert(after(p) == before(p), s"cold partition $p was rewritten")
    }
    // content identical: 60 keys, hot-bucket keys at their new values
    val got = spark.read.parquet(dir)
      .select("k", "payload").as[(String, String)].collect().toMap
    val hotKeys = hot.select("k").as[String].collect().toSet
    assert(got.size == 60)
    hotKeys.foreach(k => assert(got(k).endsWith("_u"), s"$k not updated"))
    (got.keySet -- hotKeys).foreach(k => assert(!got(k).endsWith("_u")))
    // and a second compaction is a no-op
    assert(PoolJsonSink.compactPartitions(spark, dir, 4).isEmpty)
  }

  test("upsert of an already-present identical key is idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert2")
      .resolve("table").toString
    val base = (0 until 10).map(i => (s"key$i", i.toLong)).toDF("k", "v")
    PoolJsonSink.upsertPartitioned(spark, dir, base, col("k"), nBuckets = 4)
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("key1", 1L)).toDF("k", "v"), col("k"), nBuckets = 4)
    val got = spark.read.parquet(dir).select("k", "v")
      .as[(String, Long)].collect().toMap
    assert(got.size == 10 && got("key1") == 1L)
  }
}
