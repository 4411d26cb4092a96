package graft.pol

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.spark

/** The derived change feed must (1) classify per-KEY changes exactly —
  * insert / delete / update_preimage+postimage — while reading only
  * the buckets whose manifest file sets changed, (2) drop rows that
  * live in a rewritten bucket but did not change (struct compare),
  * (3) collapse intermediate churn in endpoint mode, and (4) deliver
  * each version exactly once through the durable cursor.
  */
class ChangeFeedSpec extends AnyFunSuite {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_cdf")
      .resolve("tbl").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, String, String, Long)] =
    df.select("k", "payload", ChangeFeed.ChangeTypeCol,
        ChangeFeed.CommitVersionCol)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSet

  test("insert / update pre+post / delete classification per version") {
    val dir = freshTable()
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("a", "v1a"), ("b", "v1b"), ("c", "v1c")).toDF("k", "payload"),
      col("k"), nBuckets = 4)
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("b", "v2b"), ("d", "v2d")).toDF("k", "payload"),
      col("k"), nBuckets = 4)
    PoolJsonSink.deletePartitioned(spark, dir,
      Seq("a").toDF("k"), col("k"), nBuckets = 4)

    val v12 = ChangeFeed.readTableChanges(spark, dir, 1, 2, col("k"))
    assert(rows(v12) == Set(
      ("b", "v1b", "update_preimage", 2L),
      ("b", "v2b", "update_postimage", 2L),
      ("d", "v2d", "insert", 2L)))

    val v23 = ChangeFeed.readTableChanges(spark, dir, 2, 3, col("k"))
    assert(rows(v23) == Set(("a", "v1a", "delete", 3L)))

    // per-version over the whole range = union of the step diffs
    val v13 = ChangeFeed.readTableChanges(spark, dir, 1, 3, col("k"))
    assert(rows(v13) == rows(v12) ++ rows(v23))

    // genesis replay: version 1's snapshot arrives as inserts
    val v01 = ChangeFeed.readTableChanges(spark, dir, 0, 1, col("k"))
    assert(rows(v01) == Set(
      ("a", "v1a", "insert", 1L),
      ("b", "v1b", "insert", 1L),
      ("c", "v1c", "insert", 1L)))
  }

  test("unchanged rows in a rewritten bucket produce no change row") {
    val dir = freshTable()
    // nBuckets = 1: every key lives in the single bucket, so ANY
    // upsert rewrites the bucket holding all keys — only the actually
    // touched key may appear in the feed
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("a", "x"), ("b", "y"), ("c", "z")).toDF("k", "payload"),
      col("k"), nBuckets = 1)
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("b", "y2")).toDF("k", "payload"), col("k"), nBuckets = 1)
    val ch = ChangeFeed.readTableChanges(spark, dir, 1, 2, col("k"))
    assert(rows(ch) == Set(
      ("b", "y", "update_preimage", 2L),
      ("b", "y2", "update_postimage", 2L)))
    // ...and a re-upsert of an IDENTICAL row is a no-op in the feed
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("c", "z")).toDF("k", "payload"), col("k"), nBuckets = 1)
    assert(ChangeFeed.readTableChanges(spark, dir, 2, 3, col("k")).isEmpty)
  }

  test("version diff reads only buckets whose file sets changed") {
    val dir = freshTable()
    val base = (0 until 64).map(i => (s"key$i", s"v$i")).toDF("k", "payload")
    PoolJsonSink.upsertPartitioned(spark, dir, base, col("k"), nBuckets = 16)
    val touched = PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("key7", "v7b")).toDF("k", "payload"), col("k"), nBuckets = 16)
    val m1 = PoolJsonSink.readManifestAt(dir, 1)
    val m2 = PoolJsonSink.readManifestAt(dir, 2)
    assert(ChangeFeed.changedBuckets(m1, m2) == touched.sorted)
    assert(ChangeFeed.changedBuckets(m1, m1).isEmpty)
  }

  test("endpoint mode collapses intermediate churn") {
    val dir = freshTable()
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("a", "v1")).toDF("k", "payload"), col("k"), nBuckets = 2)
    // churn: b inserted then deleted, a rewritten twice
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("a", "v2"), ("b", "tmp")).toDF("k", "payload"),
      col("k"), nBuckets = 2)
    PoolJsonSink.deletePartitioned(spark, dir,
      Seq("b").toDF("k"), col("k"), nBuckets = 2)
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("a", "v4")).toDF("k", "payload"), col("k"), nBuckets = 2)

    val endpoint = ChangeFeed.readTableChanges(spark, dir, 1, 4, col("k"),
      perVersion = false)
    assert(rows(endpoint) == Set(
      ("a", "v1", "update_preimage", 4L),
      ("a", "v4", "update_postimage", 4L)))

    val perVersion = ChangeFeed.readTableChanges(spark, dir, 1, 4, col("k"))
    assert(perVersion.count() == 6) // a: 2 update pairs; b: insert + delete
  }

  test("durable cursor delivers each version exactly once") {
    val dir = freshTable()
    val cursor = java.nio.file.Files.createTempDirectory("graft_cdf_cur")
      .resolve("cursor").toString
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("a", "v1")).toDF("k", "payload"), col("k"), nBuckets = 2)
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("b", "v2")).toDF("k", "payload"), col("k"), nBuckets = 2)

    var seen = Vector.empty[(Long, Set[(String, String, String, Long)])]
    val got = ChangeFeed.processNewVersions(spark, dir, cursor, col("k")) {
      (df, v) => seen :+= (v, rows(df))
    }
    assert(got == Seq(1L, 2L))
    assert(seen == Vector(
      1L -> Set(("a", "v1", "insert", 1L)),
      2L -> Set(("b", "v2", "insert", 2L))))

    // nothing new → nothing delivered
    assert(ChangeFeed.processNewVersions(spark, dir, cursor, col("k")) {
      (_, _) => fail("no new version should be delivered")
    }.isEmpty)

    // a new commit delivers ONLY its own delta
    PoolJsonSink.deletePartitioned(spark, dir,
      Seq("a").toDF("k"), col("k"), nBuckets = 2)
    seen = Vector.empty
    assert(ChangeFeed.processNewVersions(spark, dir, cursor, col("k")) {
      (df, v) => seen :+= (v, rows(df))
    } == Seq(3L))
    assert(seen == Vector(3L -> Set(("a", "v1", "delete", 3L))))

    // crash BEFORE the cursor write → the version is re-delivered
    // (at-least-once; consumers idempote per version like t6's marker)
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("c", "v4")).toDF("k", "payload"), col("k"), nBuckets = 2)
    intercept[RuntimeException] {
      ChangeFeed.processNewVersions(spark, dir, cursor, col("k")) {
        (_, _) => sys.error("consumer crash")
      }
    }
    seen = Vector.empty
    ChangeFeed.processNewVersions(spark, dir, cursor, col("k")) {
      (df, v) => seen :+= (v, rows(df))
    }
    assert(seen.map(_._1) == Vector(4L))
  }

  test("SQL face: format(\"graft\") changesFrom/changesTo/changeKey") {
    val dir = freshTable()
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("a", "v1"), ("b", "v1b")).toDF("k", "payload"),
      col("k"), nBuckets = 2)
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("a", "v2")).toDF("k", "payload"), col("k"), nBuckets = 2)
    val df = spark.read.format("graft")
      .option("changesFrom", "1").option("changeKey", "k").load(dir)
    assert(rows(df) == Set(
      ("a", "v1", "update_preimage", 2L),
      ("a", "v2", "update_postimage", 2L)))
    // changesTo pins the upper bound mid-history
    PoolJsonSink.deletePartitioned(spark, dir,
      Seq("b").toDF("k"), col("k"), nBuckets = 2)
    val bounded = spark.read.format("graft")
      .option("changesFrom", "1").option("changesTo", "2")
      .option("changeKey", "k").load(dir)
    assert(bounded.where(col(ChangeFeed.CommitVersionCol) > 2).isEmpty)
  }

  test("additive schema evolution diffs old rows as null in new column") {
    val dir = freshTable()
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("a", "v1")).toDF("k", "payload"), col("k"), nBuckets = 1)
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("a", "v2", 9L)).toDF("k", "payload", "score"),
      col("k"), nBuckets = 1)
    val ch = ChangeFeed.readTableChanges(spark, dir, 1, 2, col("k"))
      .orderBy(ChangeFeed.ChangeTypeCol)
      .select("k", "payload", "score", ChangeFeed.ChangeTypeCol)
      .collect()
    assert(ch.length == 2)
    val pre = ch.find(_.getString(3) == "update_preimage").get
    val post = ch.find(_.getString(3) == "update_postimage").get
    assert(pre.isNullAt(2) && pre.getString(1) == "v1")
    assert(post.getLong(2) == 9L && post.getString(1) == "v2")
  }
}
