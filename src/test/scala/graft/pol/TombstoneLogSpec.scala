package graft.pol

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Deferred deletes (round-10 verdict item 4): the tombstone log must
  * (1) append in O(delta) without touching the data table, (2) hide
  * pending tombstones from the composed read immediately, (3) rewrite
  * ONLY buckets past the dirt threshold on apply, clearing exactly
  * the applied keys from the log, and (4) end-to-end equal the eager
  * delete — the invariant n18's oracle pins at the catalog level.
  */
class TombstoneLogSpec extends AnyFunSuite {
  import graft.QueryHarness.spark
  import spark.implicits._

  private def freshTable(n: Int, nBuckets: Int): (String, String) = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_tomb_spec_").toString
    val table = root + "/t"
    val df = (0 until n).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    PoolJsonSink.mergeDelta(spark, table, df, col("k"), nBuckets)(
      _.dropDuplicates("k"))
    (table, root + "/tomb")
  }

  test("append is O(delta): the data table's manifest does not move") {
    val (table, tomb) = freshTable(200, 8)
    val v0 = PoolJsonSink.readManifest(table).get.version
    TombstoneLog.append(spark, tomb, Seq(3L, 17L, 3L).toDF("k"))
    assert(PoolJsonSink.readManifest(table).get.version == v0)
    assert(TombstoneLog.pending(spark, tomb).count() == 2) // deduped
  }

  test("readMinus hides pending tombstones before any apply") {
    val (table, tomb) = freshTable(100, 8)
    TombstoneLog.append(spark, tomb, Seq(1L, 50L, 99L).toDF("k"))
    val got = TombstoneLog.readMinus(spark, table, tomb, "k")
    assert(got.count() == 97)
    assert(got.where(col("k").isin(1L, 50L, 99L)).isEmpty)
  }

  test("applyTo rewrites only dirty buckets and clears applied keys") {
    val (table, tomb) = freshTable(400, 8)
    val n = PoolJsonSink.readManifest(table).get.nBuckets.get
    // engine's own placement for every key, one pass
    val buckets: Map[Long, Long] = spark.range(400)
      .select(col("id"), PoolJsonSink.bucketExpr(col("id"), n).as("b"))
      .as[(Long, Long)].collect().toMap
    // doom 20 keys of bucket 0 (dirty) plus ONE key elsewhere
    val b0 = (0L until 400L).filter(buckets(_) == 0L).take(20)
    val other = (0L until 400L).find(buckets(_) != 0L).get
    TombstoneLog.append(spark, tomb, (b0 :+ other).toDF("k"))
    val rewritten = TombstoneLog.applyTo(spark, table, tomb,
      dirtPerBucket = 5L)
    assert(rewritten == Seq(0L), s"rewritten=$rewritten")
    // the lone under-threshold tombstone stays pending…
    val left = TombstoneLog.pending(spark, tomb)
      .as[Long].collect().toSet
    assert(left == Set(other))
    // …and the composed read hides applied AND pending alike
    val got = TombstoneLog.readMinus(spark, table, tomb, "k")
    assert(got.count() == 400 - b0.size - 1)
  }

  test("autoApply: a uniform wave stays fully deferred") {
    // exactly 2 dooms per bucket (pending=16, n=8): the derived
    // threshold max(2, 2·16/8)=4 sits at 2× the per-bucket mean, so
    // NO bucket crosses it — the round-11 trap (threshold under the
    // mean ⇒ eager rewrite plus log overhead) is structurally closed
    val (table, tomb) = freshTable(400, 8)
    val n = PoolJsonSink.readManifest(table).get.nBuckets.get
    val buckets: Map[Long, Long] = spark.range(400)
      .select(col("id"), PoolJsonSink.bucketExpr(col("id"), n).as("b"))
      .as[(Long, Long)].collect().toMap
    val doomed = (0L until n.toLong).flatMap(b =>
      (0L until 400L).filter(buckets(_) == b).take(2))
    assert(doomed.size == 2 * n)
    TombstoneLog.append(spark, tomb, doomed.toDF("k"))
    val v0 = PoolJsonSink.readManifest(table).get.version
    assert(TombstoneLog.autoApply(spark, table, tomb).isEmpty)
    assert(PoolJsonSink.readManifest(table).get.version == v0)
    // reads still hide the whole pending set
    assert(TombstoneLog.readMinus(spark, table, tomb, "k")
      .count() == 400 - doomed.size)
  }

  test("autoApply: a skewed wave rewrites its hot buckets only, then vacuums the log") {
    val (table, tomb) = freshTable(400, 8)
    val n = PoolJsonSink.readManifest(table).get.nBuckets.get
    val buckets: Map[Long, Long] = spark.range(400)
      .select(col("id"), PoolJsonSink.bucketExpr(col("id"), n).as("b"))
      .as[(Long, Long)].collect().toMap
    // 10 dooms into bucket 0, one elsewhere: pending=11 ⇒ derived
    // threshold max(2, 2·11/8)=2 — bucket 0 crosses, the lone key's
    // bucket does not
    val b0 = (0L until 400L).filter(buckets(_) == 0L).take(10)
    val other = (0L until 400L).find(buckets(_) != 0L).get
    TombstoneLog.append(spark, tomb, (b0 :+ other).toDF("k"))
    val rewritten = TombstoneLog.autoApply(spark, table, tomb)
    assert(rewritten == Seq(0L), s"rewritten=$rewritten")
    assert(TombstoneLog.pending(spark, tomb)
      .as[Long].collect().toSet == Set(other))
    // applied log versions were vacuumed on the same schedule
    assert(PoolJsonSink.listVersions(tomb).size == 1)
    assert(TombstoneLog.readMinus(spark, table, tomb, "k")
      .count() == 400 - b0.size - 1)
  }

  test("pendingCount memoizes per log version and tracks appends") {
    val (_, tomb) = freshTable(100, 8)
    assert(TombstoneLog.pendingCount(spark, tomb) == 0L) // no log yet
    TombstoneLog.append(spark, tomb, Seq(1L, 2L, 3L).toDF("k"))
    assert(TombstoneLog.pendingCount(spark, tomb) == 3L)
    assert(TombstoneLog.pendingCount(spark, tomb) == 3L) // memo hit
    // a new append bumps the log's manifest version ⇒ fresh count
    TombstoneLog.append(spark, tomb, Seq(3L, 9L).toDF("k"))
    assert(TombstoneLog.pendingCount(spark, tomb) == 4L)
  }

  test("deferred chain ≡ eager deletePartitioned") {
    val (table, tomb) = freshTable(300, 8)
    val (table2, _) = freshTable(300, 8)
    val doomed = (0L until 300L).filter(_ % 13 == 0)
    TombstoneLog.append(spark, tomb, doomed.toDF("k"))
    TombstoneLog.applyTo(spark, table, tomb, dirtPerBucket = 3L)
    PoolJsonSink.deletePartitioned(spark, table2, doomed.toDF("k"),
      col("k"), 8)
    val a = TombstoneLog.readMinus(spark, table, tomb, "k")
      .orderBy("k").collect().toSeq
    val b = PoolJsonSink.readTable(spark, table2)
      .orderBy("k").collect().toSeq
    assert(a == b)
  }
}
