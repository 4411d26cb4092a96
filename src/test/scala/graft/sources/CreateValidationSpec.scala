package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark
import graft.pol.PoolJsonSink

/** Validate-before-first-commit invariants on CREATE/CTAS and branch
  * creation: a malformed declaration must fail with NOTHING on disk —
  * no v0 manifest, no .ctas-* staging debris — and a branch must be
  * rejected at creation if its name falls outside the resolution
  * grammar (otherwise it exists on disk but is unresolvable forever).
  */
class CreateValidationSpec extends AnyFunSuite {

  private val wh = java.nio.file.Files
    .createTempDirectory("graft_cval_wh").toString
  spark.conf.set("spark.sql.catalog.gcv", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gcv.warehouse", wh)

  private def tableDebris(name: String): Seq[String] =
    Option(new java.io.File(s"$wh/default").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSeq
      .filter(f => f.contains(name) || f.startsWith(".ctas-"))

  test("invalid forklayer fails CREATE with no table left behind") {
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gcv.default.badlayer (k BIGINT, v STRING) " +
        "USING graft TBLPROPERTIES ('key'='k', 'forklayer'='symlink')")
    }
    assert(e.getMessage.contains("forklayer"), e.getMessage)
    assert(tableDebris("badlayer").isEmpty,
      s"half-created table stranded: ${tableDebris("badlayer")}")
    assert(!spark.catalog.tableExists("gcv.default.badlayer"))
  }

  test("invalid forklayer fails CTAS with no staging dir leaked") {
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gcv.default.badctas " +
        "USING graft TBLPROPERTIES ('key'='k', 'forklayer'='copy') " +
        "AS SELECT 1L AS k, 'a' AS v")
    }
    assert(e.getMessage.contains("forklayer"), e.getMessage)
    assert(tableDebris("badctas").isEmpty,
      s"CTAS debris leaked: ${tableDebris("badctas")}")
  }

  test("createBranch rejects names the resolver cannot see") {
    spark.sql("CREATE TABLE gcv.default.bt (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='2')")
    spark.sql("INSERT INTO gcv.default.bt VALUES (1, 'a')")
    val dir = s"$wh/default/bt"
    // all-digit names collide with @version refs — resolution treats
    // them as versions, so creation must refuse
    val e1 = intercept[IllegalArgumentException] {
      PoolJsonSink.createBranch(dir, "2024")
    }
    assert(e1.getMessage.contains("branch name"), e1.getMessage)
    // characters outside the resolution grammar
    intercept[IllegalArgumentException] {
      PoolJsonSink.createBranch(dir, "feat/x")
    }
    intercept[IllegalArgumentException] {
      PoolJsonSink.createBranch(dir, "")
    }
    // valid names still round-trip: created, resolvable, readable
    PoolJsonSink.createBranch(dir, "dev-2024.x")
    assert(PoolJsonSink.branchExists(dir, "dev-2024.x"))
    PoolJsonSink.createBranch(dir, "devx")
    assert(spark.sql(
      "SELECT k FROM gcv.default.bt.branch_devx").count() == 1)
  }
}
