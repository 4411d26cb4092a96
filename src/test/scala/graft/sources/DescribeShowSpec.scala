package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark

/** The BI-introspection surface: `DESCRIBE EXTENDED`,
  * `SHOW TBLPROPERTIES`, and `SHOW CREATE TABLE` against graft
  * catalog tables — a SQL user must be able to read back the table's
  * key/nbuckets/splitcol/checks declaration without touching
  * manifests, and `SHOW CREATE TABLE`'s output must be a runnable
  * statement that recreates an equivalently-declared table.
  */
class DescribeShowSpec extends AnyFunSuite {

  private val wh = java.nio.file.Files
    .createTempDirectory("graft_show_wh").toString
  spark.conf.set("spark.sql.catalog.gshow", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gshow.warehouse", wh)

  spark.sql("""CREATE TABLE gshow.default.acct (
    id BIGINT, region STRING, balance DOUBLE)
    USING graft TBLPROPERTIES (
      'key'='id', 'nbuckets'='8', 'statscols'='id,region',
      'check.positive_balance'='balance >= 0')""")
  spark.sql("INSERT INTO gshow.default.acct VALUES " +
    "(1, 'eu', 10.0), (2, 'us', 20.0)")

  private def props: Map[String, String] =
    spark.sql("SHOW TBLPROPERTIES gshow.default.acct")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("SHOW TBLPROPERTIES round-trips the declaration") {
    val p = props
    assert(p("key") == "id")
    assert(p("nbuckets") == "8")
    assert(p("statscols") == "id,region")
    assert(p("check.positive_balance") == "balance >= 0")
    // `provider`/`location` are Spark-reserved and filtered from SHOW
    // TBLPROPERTIES output; DESCRIBE EXTENDED carries them instead
  }

  test("DESCRIBE EXTENDED shows columns and the bucket layout") {
    val rows = spark.sql("DESCRIBE EXTENDED gshow.default.acct")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val cols = rows.toMap
    assert(cols.get("id").contains("bigint"))
    assert(cols.get("region").contains("string"))
    assert(cols.get("balance").contains("double"))
    // the storage layout surfaces as the v2 partitioning transform
    val flat = rows.map { case (a, b) => s"$a $b" }.mkString("\n")
    assert(flat.contains("bucket(8, id)"),
      s"expected bucket(8, id) in DESCRIBE EXTENDED output:\n$flat")
  }

  test("SHOW CREATE TABLE emits a runnable equivalent declaration") {
    val stmt = spark.sql("SHOW CREATE TABLE gshow.default.acct")
      .head.getString(0)
    assert(stmt.contains("USING graft"), stmt)
    assert(stmt.contains("'key' = 'id'") || stmt.contains("'key'='id'"),
      stmt)
    assert(stmt.contains("positive_balance"), stmt)
    // runnable: replay the emitted DDL as a new table (strip the
    // catalog-managed location/ownership style properties Spark
    // includes; a copied table gets its own location)
    val replay = stmt
      .replace("gshow.default.acct", "gshow.default.acct2")
      .replaceAll("(?i)LOCATION\\s+'[^']*'", "")
    spark.sql(replay)
    val p2 = spark.sql("SHOW TBLPROPERTIES gshow.default.acct2")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(p2("key") == "id")
    assert(p2("nbuckets") == "8")
    assert(p2("check.positive_balance") == "balance >= 0")
    // and the recreated table's CHECK actually gates writes
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gshow.default.acct2 VALUES (1, 'eu', -5.0)")
    }
    assert(e.getMessage != null)
    spark.sql("DROP TABLE gshow.default.acct2")
  }

  test("undersized-bucket advisory fires on a fat-bucket table only") {
    // the small acct table (2 rows / 8 buckets) carries NO advisory
    assert(!props.contains("advisory.buckets"))
    // a table whose single bucket holds > AdvisoryRowsPerBucket keys
    // surfaces the advisory with a catch-up factor through SHOW
    // TBLPROPERTIES (and therefore DESCRIBE EXTENDED)
    val n = GraftCatalogTable.AdvisoryRowsPerBucket + 1
    spark.sql("CREATE TABLE gshow.default.fat (id BIGINT, v BIGINT) " +
      "USING graft TBLPROPERTIES ('key'='id', 'nbuckets'='1')")
    spark.sql(
      s"INSERT INTO gshow.default.fat SELECT id, id * 2 FROM range($n)")
    val p = spark.sql("SHOW TBLPROPERTIES gshow.default.fat")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(p.contains("advisory.buckets"), p.keys.toSeq.sorted)
    assert(p("advisory.buckets").contains("system.split"))
    assert(p("advisory.buckets").contains("factor => 2"))
    spark.sql("DROP TABLE gshow.default.fat")
  }
}
