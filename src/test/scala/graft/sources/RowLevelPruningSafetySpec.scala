package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.spark
import graft.pol.PoolJsonSink

/** The review-caught data-loss hazard, pinned: a row-level statement's
  * SCAN must not apply planning-time file/bucket pruning, because the
  * COW commit replaces whole buckets assuming every surviving row was
  * re-emitted. Both reported scenarios:
  *  1. zone-map file pruning inside a scanned bucket (DELETE with a
  *     range predicate on a stats column) — pruned files' rows were
  *     silently deleted;
  *  2. key-hash bucket pruning with runtime group filtering DISABLED
  *     (UPDATE WHERE k = v) — the commit full-replaced the table from
  *     one bucket's rows.
  */
class RowLevelPruningSafetySpec extends AnyFunSuite {
  import spark.implicits._

  private val wh = java.nio.file.Files
    .createTempDirectory("rlp_wh").toString
  spark.conf.set("spark.sql.catalog.grp2", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.grp2.warehouse", wh)

  test("DELETE with a zone-map-prunable predicate keeps non-matching rows") {
    // adopted table with MULTIPLE files per bucket carrying disjoint
    // seq zone maps — the layout where file pruning has teeth
    val ext = java.nio.file.Files
      .createTempDirectory("rlp_ext").toString
    val df = (1L to 8000L).map(i => (i, i, s"v$i"))
      .toDF("k", "seq", "v")
      .repartitionByRange(4, col("seq"))
    PoolJsonSink.upsertPartitioned(spark, ext, df, col("k"), 8,
      statsCols = Seq("seq"), optimizedWrite = false)
    val filesPerBucket = PoolJsonSink.readManifest(ext).get
      .buckets.values.map(_.size).max
    assert(filesPerBucket > 1, "fixture needs multi-file buckets")

    spark.sql("CREATE TABLE grp2.default.zdel USING graft " +
      s"LOCATION '$ext'")
    spark.sql("DELETE FROM grp2.default.zdel " +
      "WHERE seq BETWEEN 6001 AND 7000")
    // exactly the 1000 matching rows gone; every other row intact —
    // including rows in files the zone map COULD have pruned from the
    // scan of rewritten buckets
    assert(spark.sql("SELECT count(*) FROM grp2.default.zdel")
      .head.getLong(0) == 7000L)
    assert(spark.sql("SELECT min(seq), max(seq) FROM grp2.default.zdel " +
      "WHERE seq <= 6000").head.getLong(0) == 1L)
    spark.sql("DROP TABLE grp2.default.zdel")
  }

  test("UPDATE WHERE key = v with runtime group filtering disabled") {
    spark.sql("CREATE TABLE grp2.default.kup (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k','nbuckets'='8')")
    spark.sql("INSERT INTO grp2.default.kup " +
      "SELECT id, concat('v', id) FROM range(0, 1000)")
    val conf = "spark.sql.optimizer.runtimeRowLevelOperationGroupFilter.enabled"
    spark.conf.set(conf, "false")
    try {
      spark.sql("UPDATE grp2.default.kup SET v = 'X' WHERE k = 777")
    } finally spark.conf.set(conf, "true")
    // the full-replace path must have re-emitted EVERY row, not just
    // k=777's bucket
    assert(spark.sql("SELECT count(*) FROM grp2.default.kup")
      .head.getLong(0) == 1000L)
    assert(spark.sql("SELECT v FROM grp2.default.kup WHERE k = 777")
      .head.getString(0) == "X")
    assert(spark.sql("SELECT v FROM grp2.default.kup WHERE k = 778")
      .head.getString(0) == "v778")
    spark.sql("DROP TABLE grp2.default.kup")
  }
}
