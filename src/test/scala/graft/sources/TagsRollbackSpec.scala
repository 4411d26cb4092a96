package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark
import graft.pol.PoolJsonSink

/** Named versions (tags) and rollback — the snapshot-management pair
  * that makes time travel OPERATIONAL: a tag pins a version through
  * vacuum under a stable name (`VERSION AS OF 'release'`), rollback
  * restores a prior version's content as a new append-only commit.
  * Every behavior is exercised from SQL (procedures + time travel +
  * the `.tags` sub-table); the vacuum interplay is pinned both ways
  * (tag protects; drop_tag releases).
  */
class TagsRollbackSpec extends AnyFunSuite {

  private val wh = java.nio.file.Files
    .createTempDirectory("gtag_wh").toString
  spark.conf.set("spark.sql.catalog.gtag", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gtag.warehouse", wh)

  spark.sql("CREATE TABLE gtag.default.t (k BIGINT, v BIGINT) " +
    "USING graft TBLPROPERTIES ('key'='k','nbuckets'='4')")
  // v2: 100 rows; v3: upsert doubles v for half the keys
  spark.sql("INSERT INTO gtag.default.t SELECT id, id FROM range(0, 100)")
  spark.sql("INSERT INTO gtag.default.t SELECT id, id * 2 " +
    "FROM range(0, 50)")

  private def dir = s"$wh/default/t"
  private def sumV(q: String): Long =
    spark.sql(q).collect().head.getLong(0)

  test("tag pins a version and VERSION AS OF resolves it by name") {
    spark.sql("CALL gtag.system.tag(tbl => 'default.t', " +
      "name => 'pre-double', version => 2)")
    // current: 50 doubled keys. Tagged v2: sum(0..99) = 4950
    assert(sumV("SELECT sum(v) FROM gtag.default.t") == 4950 + 1225)
    assert(sumV("SELECT sum(v) FROM gtag.default.t " +
      "VERSION AS OF 'pre-double'") == 4950)
    // numeric operands still travel to the literal version
    assert(sumV("SELECT sum(v) FROM gtag.default.t VERSION AS OF 2")
      == 4950)
  }

  test(".tags sub-table lists the pin with its commit metadata") {
    val rows = spark.sql(
      "SELECT tag, version, operation FROM gtag.default.t.tags").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet
      .contains(("pre-double", 2L)))
  }

  test("unknown tag fails with the available tags in the message") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gtag.default.t VERSION AS OF 'nope'")
        .collect()
    }
    assert(e.getMessage.contains("no tag 'nope'") &&
      e.getMessage.contains("pre-double"))
  }

  test("tagged version survives vacuum; drop_tag releases it") {
    // retention of 1 would normally reclaim v1 and v2
    spark.sql("CALL gtag.system.vacuum(tbl => 'default.t', retain => 1, " +
      "min_age_ms => 0)")
    assert(PoolJsonSink.listVersions(dir).contains(2L),
      "tag must pin v2 through vacuum")
    assert(!PoolJsonSink.listVersions(dir).contains(1L),
      "untagged v1 is expired normally")
    // the pinned snapshot still READS (its files survived too)
    assert(sumV("SELECT sum(v) FROM gtag.default.t " +
      "VERSION AS OF 'pre-double'") == 4950)

    spark.sql("CALL gtag.system.drop_tag(tbl => 'default.t', " +
      "name => 'pre-double')")
    spark.sql("CALL gtag.system.vacuum(tbl => 'default.t', retain => 1, " +
      "min_age_ms => 0)")
    assert(!PoolJsonSink.listVersions(dir).contains(2L),
      "dropping the tag releases the version to vacuum")
  }

  test("rollback restores prior content as a NEW commit") {
    spark.sql("CREATE TABLE gtag.default.r (k BIGINT, v BIGINT) " +
      "USING graft TBLPROPERTIES ('key'='k','nbuckets'='4')")
    spark.sql("INSERT INTO gtag.default.r SELECT id, id FROM range(0, 10)")
    spark.sql("CALL gtag.system.tag(tbl => 'default.r', name => 'good')")
    spark.sql("INSERT INTO gtag.default.r SELECT id, 0 FROM range(0, 10)")
    assert(sumV("SELECT sum(v) FROM gtag.default.r") == 0)

    val out = spark.sql("CALL gtag.system.rollback(" +
      "tbl => 'default.r', version => 'good')").collect().head
    assert(out.getLong(2) > out.getLong(0), "rollback commits a new head")
    assert(sumV("SELECT sum(v) FROM gtag.default.r") == 45)
    // append-only history: the rolled-past version still reads
    val badV = out.getLong(0)
    assert(sumV(s"SELECT sum(v) FROM gtag.default.r VERSION AS OF $badV")
      == 0)
    // provenance: head records op ROLLBACK in .history
    val op = spark.sql("SELECT operation FROM gtag.default.r.history " +
      "ORDER BY version DESC LIMIT 1").collect().head.getString(0)
    assert(op == "ROLLBACK")
  }

  test("rollback to the current head is a no-op commit-wise") {
    val head = PoolJsonSink.readManifest(s"$wh/default/r").get.version
    assert(PoolJsonSink.rollback(s"$wh/default/r", head) == head)
    assert(PoolJsonSink.readManifest(s"$wh/default/r").get.version == head)
  }

  test("the v1 path face resolves versionAsOf tags too") {
    // 'good' still pins the pre-zeroing snapshot of r
    val sum = spark.read.format("graft")
      .option("versionAsOf", "good").load(s"$wh/default/r")
      .agg(org.apache.spark.sql.functions.sum("v"))
      .collect().head.getLong(0)
    assert(sum == 45L)
  }

  test("all-digit and unsafe tag names are refused") {
    intercept[IllegalArgumentException] {
      PoolJsonSink.setTag(dir, "123", 3L)
    }
    intercept[IllegalArgumentException] {
      PoolJsonSink.setTag(dir, "a/b", 3L)
    }
  }

  test("tagging a vacuumed/absent version fails clearly") {
    val e = intercept[Exception] { PoolJsonSink.setTag(dir, "ghost", 1L) }
    assert(e.getMessage.contains("not available"))
  }
}
