package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark
import graft.pol.PoolJsonSink

/** Named CHECK constraints as TABLE state (`TBLPROPERTIES
  * ('check.<name>'='<expr>')` — the Delta CHECK/expectation contract):
  * enforced on every ingesting write path (V1 keyed merge AND the V2
  * executor-side COW write, whose SET clauses can manufacture values
  * no scan-side gate sees), violations reject the statement WHOLLY
  * before the version line advances, NULL results pass per SQL CHECK,
  * and declaring a constraint validates EXISTING data first.
  */
class CheckConstraintsSpec extends AnyFunSuite {

  private val wh = java.nio.file.Files
    .createTempDirectory("gchk_wh").toString
  spark.conf.set("spark.sql.catalog.gchk", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gchk.warehouse", wh)

  spark.sql("CREATE TABLE gchk.default.t (k BIGINT, v BIGINT) " +
    "USING graft TBLPROPERTIES ('key'='k','nbuckets'='2'," +
    "'check.positive'='v > 0')")

  private def dir = s"$wh/default/t"
  private def count() = spark.sql(
    "SELECT count(*) FROM gchk.default.t").collect().head.getLong(0)

  test("valid inserts pass; a violating batch rejects wholly") {
    spark.sql("INSERT INTO gchk.default.t SELECT id, id + 1 " +
      "FROM range(0, 10)")
    assert(count() == 10L)
    val vBefore = PoolJsonSink.readManifest(dir).get.version
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gchk.default.t VALUES (100, 5), (101, -1)")
    }
    assert(e.getMessage.contains("positive"))
    assert(count() == 10L, "the whole batch must reject, not just " +
      "the bad row")
    assert(PoolJsonSink.readManifest(dir).get.version == vBefore,
      "no version advance on a rejected batch")
  }

  test("NULL check results pass (SQL CHECK semantics)") {
    spark.sql("INSERT INTO gchk.default.t VALUES (200, NULL)")
    assert(count() == 11L)
  }

  test("the COW write path enforces too: a violating UPDATE rejects") {
    val e = intercept[Exception] {
      spark.sql("UPDATE gchk.default.t SET v = -5 WHERE k = 3")
    }
    assert(e.getMessage.contains("positive"))
    assert(spark.sql("SELECT v FROM gchk.default.t WHERE k = 3")
      .collect().head.getLong(0) == 4L, "table untouched")
    // a valid UPDATE still lands
    spark.sql("UPDATE gchk.default.t SET v = 40 WHERE k = 3")
    assert(spark.sql("SELECT v FROM gchk.default.t WHERE k = 3")
      .collect().head.getLong(0) == 40L)
  }

  test("declaring a check validates existing data and can refuse") {
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gchk.default.t SET TBLPROPERTIES " +
        "('check.small'='v < 20')")
    }
    assert(e.getMessage.contains("existing rows violate"))
    // and the refusal recorded nothing
    assert(PoolJsonSink.readManifest(dir).get.checks
      .map(_._1) == Seq("positive"))
  }

  test("SHOW TBLPROPERTIES surfaces checks; UNSET removes enforcement") {
    val props = spark.sql("SHOW TBLPROPERTIES gchk.default.t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("check.positive").contains("v > 0"))
    spark.sql("ALTER TABLE gchk.default.t UNSET TBLPROPERTIES " +
      "('check.positive')")
    spark.sql("INSERT INTO gchk.default.t VALUES (300, -9)")
    assert(spark.sql("SELECT v FROM gchk.default.t WHERE k = 300")
      .collect().head.getLong(0) == -9L)
  }
}
