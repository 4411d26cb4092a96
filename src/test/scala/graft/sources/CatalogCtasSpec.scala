package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark

/** CREATE TABLE ... AS SELECT through the catalog: Spark's v2
  * CreateTableAsSelect plan is createTable + the table's own write,
  * so CTAS is a keyed MERGE into a fresh table in one statement.
  * The merge key must be stated (TBLPROPERTIES) like any CREATE.
  */
class CatalogCtasSpec extends AnyFunSuite {
  import spark.implicits._

  private val wh = java.nio.file.Files
    .createTempDirectory("gctas_wh").toString
  spark.conf.set("spark.sql.catalog.gctas", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gctas.warehouse", wh)

  test("CTAS creates, keys, and loads in one statement") {
    spark.sql(
      "CREATE TABLE gctas.default.c TBLPROPERTIES ('key'='id') " +
        "AS SELECT id, id * 2 AS v FROM range(0, 100)")
    assert(spark.table("gctas.default.c").count() == 100L)
    // the CTAS-built table is a full graft table: keyed upsert works
    spark.sql("INSERT INTO gctas.default.c SELECT id, 0L FROM range(0, 10)")
    val t = spark.table("gctas.default.c")
    assert(t.count() == 100L, "INSERT INTO must merge on the CTAS key")
    assert(t.where($"id" < 10 && $"v" === 0L).count() == 10L)
  }

  test("a failed CTAS aborts cleanly: no half-created table left behind") {
    intercept[Exception] {
      spark.sql(
        "CREATE TABLE gctas.default.bad TBLPROPERTIES ('key'='id') " +
          "AS SELECT id, assert_true(id < 5, 'boom') AS v " +
          "FROM range(0, 100)")
    }
    assert(!spark.catalog.tableExists("gctas.default.bad"),
      "abortStagedChanges must drop the partially-created table")
    // the staging was PRIVATE: no .ctas- debris survives the abort,
    // and nothing ever existed at the table's name (a reader racing
    // the failed CTAS could never have observed an empty table)
    val ns = new java.io.File(s"$wh/default")
    val debris = Option(ns.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(".ctas-"))
    assert(debris.isEmpty, s"staging debris: ${debris.mkString(",")}")
  }

  test("CTAS staging never appears in listTables or namespace listings") {
    // a lingering staged dir (crashed writer) must stay invisible
    val staged = new java.io.File(s"$wh/default/.ctas-ghost-deadbeef")
    import org.apache.spark.sql.functions.col
    graft.pol.PoolJsonSink.upsertPartitioned(spark, staged.toString,
      spark.range(3).select(col("id").as("k")), col("k"), 2)
    try {
      val names = spark.sql("SHOW TABLES IN gctas.default")
        .select("tableName").as[String].collect().toSet
      assert(!names.exists(_.contains("ctas-ghost")),
        s"staging dirs must not list as tables: $names")
      val nss = spark.sql("SHOW NAMESPACES IN gctas")
        .collect().map(_.getString(0)).toSet
      assert(!nss.exists(_.contains("ctas-ghost")))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(staged)
  }

  test("RTAS atomically rebuilds with a new schema; history survives") {
    spark.sql(
      "CREATE TABLE gctas.default.r TBLPROPERTIES ('key'='k') " +
        "AS SELECT id AS k, concat('old', id) AS a FROM range(0, 60)")
    val vOld = spark.sql("SHOW TBLPROPERTIES gctas.default.r")
      .as[(String, String)].collect().toMap.apply("version").toLong
    spark.sql(
      "REPLACE TABLE gctas.default.r " +
        "TBLPROPERTIES ('key'='k','statscols'='k,b') " +
        "AS SELECT id * 10 AS k, id * 5 AS b FROM range(0, 25)")
    val t = spark.table("gctas.default.r")
    assert(t.columns.toSeq == Seq("k", "b"), "REPLACE re-declares the schema")
    assert(t.count() == 25L)
    assert(t.where($"k" === 240L).select($"b").as[Long].head() == 120L)
    // history: the pre-replace content stays time-travel-readable
    val old = spark.read.format("graft")
      .option("versionAsOf", vOld)
      .load(s"$wh/default/r")
    assert(old.count() == 60L && old.columns.contains("a"))
    // the new declaration took: statscols answers min/max from metadata
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val agg = spark.sql("SELECT min(b) AS mn, max(k) AS mx " +
        "FROM gctas.default.r")
      val local = agg.queryExecution.executedPlan.collect {
        case l: org.apache.spark.sql.execution.LocalTableScanExec => l
      }
      assert(local.nonEmpty, "REPLACE's statscols must be live:\n" +
        agg.queryExecution.executedPlan)
      val row = agg.collect().head
      assert(row.getLong(0) == 0L && row.getLong(1) == 240L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    // keyed merge still works against the replaced declaration
    spark.sql("INSERT INTO gctas.default.r VALUES (240, 1)")
    assert(spark.table("gctas.default.r").count() == 25L)
  }

  test("a failed RTAS leaves the table exactly as it was") {
    spark.sql(
      "CREATE TABLE gctas.default.keep TBLPROPERTIES ('key'='k') " +
        "AS SELECT id AS k, id AS v FROM range(0, 30)")
    intercept[Exception] {
      spark.sql(
        "REPLACE TABLE gctas.default.keep TBLPROPERTIES ('key'='k') " +
          "AS SELECT id AS k, assert_true(id < 5, 'boom') AS v " +
          "FROM range(0, 30)")
    }
    val t = spark.table("gctas.default.keep")
    assert(t.count() == 30L, "failed RTAS must not touch the table")
    assert(t.columns.toSeq == Seq("k", "v"))
    // no staging debris left in the table dir
    val leftovers = Option(new java.io.File(s"$wh/default/keep")
      .listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(".rtas-"))
    assert(leftovers.isEmpty, "abort must delete the staging dir")
  }

  test("REPLACE without restating statscols inherits the declaration") {
    spark.sql(
      "CREATE TABLE gctas.default.inh TBLPROPERTIES " +
        "('key'='k','statscols'='k') " +
        "AS SELECT id AS k FROM range(0, 40)")
    spark.sql(
      "REPLACE TABLE gctas.default.inh TBLPROPERTIES ('key'='k') " +
        "AS SELECT id + 100 AS k FROM range(0, 40)")
    val props = spark.sql("SHOW TBLPROPERTIES gctas.default.inh")
      .as[(String, String)].collect().toMap
    assert(props.get("statscols").contains("k"),
      "absent property inherits, like key and nbuckets")
    // and an explicitly EMPTY property clears it
    spark.sql(
      "REPLACE TABLE gctas.default.inh TBLPROPERTIES " +
        "('key'='k','statscols'='') " +
        "AS SELECT id AS k FROM range(0, 4)")
    val cleared = spark.sql("SHOW TBLPROPERTIES gctas.default.inh")
      .as[(String, String)].collect().toMap
    assert(!cleared.contains("statscols"))
  }

  test("truncated footer statistics are never served as exact answers") {
    // a writer session configured to truncate binary footer stats
    // must not record BinStat zone maps (a truncated max is
    // incremented PAST the true value — fine for pruning, wrong for
    // `max(s)` answered from metadata)
    spark.conf.set("parquet.statistics.truncate.length", "8")
    try {
      spark.sql(
        "CREATE TABLE gctas.default.trunc TBLPROPERTIES " +
          "('key'='k','statscols'='k,s') " +
          "AS SELECT id AS k, concat('prefixprefix', id) AS s " +
          "FROM range(0, 30)")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val agg = spark.sql(
          "SELECT max(s) AS mx FROM gctas.default.trunc")
        val scans = agg.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec => b
        }
        assert(scans.nonEmpty,
          "max over a truncation-configured string column must scan")
        assert(agg.as[String].head() == "prefixprefix9")
        // LONG stats are untouched by binary truncation
        val k = spark.sql("SELECT max(k) AS mk FROM gctas.default.trunc")
        assert(k.queryExecution.executedPlan.collect {
          case l: org.apache.spark.sql.execution.LocalTableScanExec => l
        }.nonEmpty)
        assert(k.as[Long].head() == 29L)
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    } finally spark.conf.unset("parquet.statistics.truncate.length")
  }

  test("CREATE OR REPLACE routes by existence") {
    spark.sql(
      "CREATE OR REPLACE TABLE gctas.default.cor " +
        "TBLPROPERTIES ('key'='k') " +
        "AS SELECT id AS k FROM range(0, 5)")
    assert(spark.table("gctas.default.cor").count() == 5L)
    spark.sql(
      "CREATE OR REPLACE TABLE gctas.default.cor " +
        "TBLPROPERTIES ('key'='k') " +
        "AS SELECT id AS k FROM range(0, 9)")
    assert(spark.table("gctas.default.cor").count() == 9L)
  }
}
