package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.spark
import graft.pol.PoolJsonSink

/** The change feed across MAINTENANCE commits — the two interplays
  * most likely to go wrong at scale:
  *  - OPTIMIZE (compaction) rewrites bucket FILES without changing a
  *    row: its version's diff must be EMPTY (the reader's carried-row
  *    suppression doing its job over a 100%-rewritten bucket);
  *  - SPLITBUCKETS changes the placement layout mid-history: the
  *    per-bucket key-locality argument is void for that step, so the
  *    planner must fall back to ONE whole-pair partition — degraded
  *    parallelism, identical rows.
  */
class ChangesMaintenanceSpec extends AnyFunSuite {
  import spark.implicits._

  private val wh =
    java.nio.file.Files.createTempDirectory("graft_mx_wh").toString
  spark.conf.set("spark.sql.catalog.gmx", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gmx.warehouse", wh)

  private def changes(name: String, from: Long, to: Long) =
    spark.read
      .option("startingVersion", from.toString)
      .option("endingVersion", to.toString)
      .table(s"gmx.default.$name.changes")

  test("a compaction commit yields an EMPTY change batch") {
    spark.sql("CREATE TABLE gmx.default.c (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='2')")
    val dir = s"$wh/default/c"
    (1 to 4).foreach { i =>
      PoolJsonSink.upsertPartitioned(spark, dir,
        Seq((i.toLong, s"v$i"), (i.toLong + 100, s"w$i")).toDF("k", "v"),
        col("k"), nBuckets = 2)
    }
    val before = PoolJsonSink.readManifest(dir).get
    // the OPTIMIZE-layout pass (clusterBy) rewrites EVERY bucket's
    // files unconditionally — the pure files-changed-rows-didn't case
    val compacted = PoolJsonSink.compactPartitions(
      spark, dir, clusterBy = Seq("v"))
    assert(compacted.nonEmpty, "layout pass should have rewritten buckets")
    val head = PoolJsonSink.readManifest(dir).get.version
    assert(head == before.version + 1)
    // files changed in every compacted bucket; rows did not
    assert(changes("c", before.version, head).count() == 0)
    // and the full-history replay is unaffected
    assert(changes("c", 0L, head)
      .where(col("_change_type") === "insert").count() == 8)
  }

  test("a rebucketing commit falls back to one whole-pair partition " +
    "and still diffs row-exactly") {
    spark.sql("CREATE TABLE gmx.default.s (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='2')")
    val dir = s"$wh/default/s"
    PoolJsonSink.upsertPartitioned(spark, dir,
      (1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"),
      col("k"), nBuckets = 2)
    val v1 = PoolJsonSink.readManifest(dir).get.version
    PoolJsonSink.splitBuckets(spark, dir, col("k"), factor = 4)
    val v2 = PoolJsonSink.readManifest(dir).get.version
    // layout changed: the planner must emit exactly ONE partition
    // for the split step (key-locality across the pair is gone)
    val parts = GraftChanges.planRange(dir, v1, v2)
    assert(parts.length == 1, s"expected whole-pair fallback, " +
      s"got ${parts.length} partitions")
    // the split moved every file but no rows: empty diff
    assert(changes("s", v1, v2).count() == 0)
    // post-split commits diff per NEW bucket again, and an update
    // classifies correctly across the layout change
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq((1L, "V1"), (99L, "new")).toDF("k", "v"),
      col("k"), nBuckets = 8)
    val v3 = PoolJsonSink.readManifest(dir).get.version
    val last = changes("s", v2, v3)
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(last == Set((1L, "update_preimage"), (1L, "update_postimage"),
      (99L, "insert")))
    // endpoint collapse ACROSS the split (the append face's shape):
    // genesis to head = the current snapshot as inserts
    val snap = GraftChanges.planEndpoints(dir, 0L, v3)
    assert(snap.nonEmpty)
    assert(changes("s", 0L, v3).count() ==
      changes("s", 0L, v1).count() + 3) // 20 inserts + pre/post/insert
  }
}
