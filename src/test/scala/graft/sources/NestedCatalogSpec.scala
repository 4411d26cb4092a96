package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark

/** The two single-level-only restrictions, lifted: namespaces nest
  * (`gcat.a.b.t`, listed/created/dropped per level, never confused
  * with table dirs), and ADD COLUMN reaches INSIDE struct columns
  * with old rows null-filling the new nested field.
  */
class NestedCatalogSpec extends AnyFunSuite {

  private val wh =
    java.nio.file.Files.createTempDirectory("graft_nested_wh").toString
  spark.conf.set("spark.sql.catalog.gns", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gns.warehouse", wh)

  test("nested namespaces: create, list, resolve tables, drop") {
    spark.sql("CREATE NAMESPACE gns.teamA")
    spark.sql("CREATE NAMESPACE gns.teamA.raw")
    spark.sql("CREATE TABLE gns.teamA.raw.ev (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='2')")
    spark.sql("INSERT INTO gns.teamA.raw.ev VALUES (1, 'a'), (2, 'b')")

    // name resolution through the nested path
    assert(spark.sql("SELECT count(*) AS n FROM gns.teamA.raw.ev")
      .collect().head.getLong(0) == 2L)

    // SHOW NAMESPACES at each level; the TABLE dir is never listed
    // as a namespace
    val top = spark.sql("SHOW NAMESPACES IN gns")
      .collect().map(_.getString(0)).toSet
    assert(top.contains("teamA"))
    val mid = spark.sql("SHOW NAMESPACES IN gns.teamA")
      .collect().map(_.getString(0)).toSet
    assert(mid == Set("teamA.raw"))
    assert(spark.sql("SHOW NAMESPACES IN gns.teamA.raw")
      .collect().isEmpty)
    assert(spark.sql("SHOW TABLES IN gns.teamA.raw")
      .collect().map(_.getString(1)).toSet == Set("ev"))

    // the .changes sub-table composes with nesting
    assert(spark.read.table("gns.teamA.raw.ev.changes")
      .select("_change_type").distinct()
      .collect().map(_.getString(0)).toSet == Set("insert"))

    // a non-empty namespace refuses a plain drop; cascade removes it
    intercept[Exception] {
      spark.sql("DROP NAMESPACE gns.teamA")
    }
    spark.sql("DROP NAMESPACE gns.teamA CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN gns")
      .collect().map(_.getString(0)).contains("teamA"))
  }

  test("nested ADD COLUMN: a field appended inside a struct, old " +
    "rows null-filled, merge carries it") {
    spark.sql("CREATE TABLE gns.default.doc (k BIGINT, " +
      "meta STRUCT<src: STRING, lang: STRING>) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='2')")
    spark.sql("INSERT INTO gns.default.doc VALUES " +
      "(1, named_struct('src', 'web', 'lang', 'en'))")
    spark.sql("ALTER TABLE gns.default.doc " +
      "ADD COLUMN meta.score DOUBLE")

    // schema evolved in place; the old row reads the nested field
    // as NULL with no file rewrite
    val r = spark.sql("SELECT k, meta.src, meta.score " +
      "FROM gns.default.doc").collect().head
    assert(r.getLong(0) == 1L && r.getString(1) == "web" && r.isNullAt(2))

    // a merge write carries the evolved struct both ways: the new
    // row's score lands, the old row keeps nulling
    spark.sql("INSERT INTO gns.default.doc VALUES " +
      "(2, named_struct('src', 'book', 'lang', 'de', 'score', 0.9))")
    val rows = spark.sql("SELECT k, meta.score FROM gns.default.doc " +
      "ORDER BY k").collect()
    assert(rows(0).isNullAt(1) && rows(1).getDouble(1) == 0.9)

    // adding into a non-struct refuses clearly
    val ex = intercept[Exception] {
      spark.sql("ALTER TABLE gns.default.doc ADD COLUMN k.sub INT")
    }
    assert(ex.getMessage.contains("not a struct") ||
      Option(ex.getCause).exists(_.getMessage.contains("not a struct")))
    // duplicate nested adds refuse
    intercept[Exception] {
      spark.sql("ALTER TABLE gns.default.doc ADD COLUMN meta.score INT")
    }
    spark.sql("DROP TABLE gns.default.doc")
  }
}
