package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark

/** Metadata-powered planning: aggregates answered from the manifest
  * (complete DSv2 aggregate pushdown → LocalTableScan, zero file
  * reads), exact planning-time statistics (auto-broadcast of small
  * graft tables without a hint), and limit pushdown (a file prefix
  * covering the limit). Each positive case pins the PLAN (the whole
  * point is which operators are absent) and the VALUES against the
  * data path; each negative case pins the fallback to the ordinary
  * scan.
  */
class MetadataPushdownSpec extends AnyFunSuite {
  import spark.implicits._

  private val wh = java.nio.file.Files
    .createTempDirectory("gmeta_wh").toString
  spark.conf.set("spark.sql.catalog.gmeta", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gmeta.warehouse", wh)

  spark.sql("CREATE TABLE gmeta.default.t (k BIGINT, v BIGINT, s STRING) " +
    "USING graft " +
    "TBLPROPERTIES ('key'='k','nbuckets'='8','statscols'='k,v,s')")
  // two commits → multiple files per bucket; negative v values and an
  // empty-string s probe the boundary stats
  spark.sql("INSERT INTO gmeta.default.t " +
    "SELECT id, id * 7 - 1000, concat('s', lpad(id, 4, '0')) " +
    "FROM range(0, 900)")
  spark.sql("INSERT INTO gmeta.default.t " +
    "SELECT id, id * 7 - 1000, concat('s', lpad(id, 4, '0')) " +
    "FROM range(900, 1000)")

  private def localScans(df: DataFrame) =
    df.queryExecution.executedPlan.collect { case l: LocalTableScanExec => l }
  private def batchScans(df: DataFrame) =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }

  /** Plan-shape assertions need AQE off: AdaptiveSparkPlanExec hides
    * its children from `collect` until execution (the harness runs
    * with AQE on, like Bench).
    */
  private def withAqeOff[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("count(*)/min/max answer from the manifest as a LocalTableScan") {
    val df = spark.sql(
      "SELECT count(*) AS n, min(v) AS mnv, max(v) AS mxv, " +
        "min(s) AS mns, max(s) AS mxs FROM gmeta.default.t")
    assert(localScans(df).nonEmpty && batchScans(df).isEmpty,
      s"expected a metadata-only plan:\n${df.queryExecution.executedPlan}")
    val r = df.collect().head
    assert(r.getLong(0) == 1000L)
    assert(r.getLong(1) == -1000L && r.getLong(2) == 7L * 999 - 1000)
    assert(r.getString(3) == "s0000" && r.getString(4) == "s0999")
  }

  test("a filtered aggregate takes the data path and stays correct") {
    withAqeOff {
      val df = spark.sql(
        "SELECT count(*) AS n, max(v) AS mx FROM gmeta.default.t " +
          "WHERE k < 100")
      assert(batchScans(df).nonEmpty,
        "a residual filter must force the ordinary scan")
      val r = df.collect().head
      assert(r.getLong(0) == 100L && r.getLong(1) == 7L * 99 - 1000)
    }
  }

  test("an unanswerable aggregate falls back: avg, and min on an unstated column") {
    withAqeOff {
      // avg is not answerable from zone maps
      val avg = spark.sql("SELECT avg(v) AS a FROM gmeta.default.t")
      assert(batchScans(avg).nonEmpty)
      assert(avg.collect().head.getDouble(0) ==
        (0 until 1000).map(_ * 7L - 1000).sum.toDouble / 1000)
      // a column never opted into zone maps has no per-file stats
      spark.sql("CREATE TABLE gmeta.default.nostats (k BIGINT, v BIGINT) " +
        "USING graft TBLPROPERTIES ('key'='k','nbuckets'='4')")
      spark.sql("INSERT INTO gmeta.default.nostats " +
        "SELECT id, id * 3 FROM range(0, 50)")
      val mn = spark.sql("SELECT min(v) AS m FROM gmeta.default.nostats")
      assert(batchScans(mn).nonEmpty)
      assert(mn.collect().head.getLong(0) == 0L)
      // count(*) still answers from metadata: row counts are always
      // recorded, statscols or not
      val cnt = spark.sql("SELECT count(*) AS n FROM gmeta.default.nostats")
      assert(localScans(cnt).nonEmpty && batchScans(cnt).isEmpty)
      assert(cnt.collect().head.getLong(0) == 50L)
    }
  }

  test("empty table: count 0, min/max NULL, straight from metadata") {
    spark.sql("CREATE TABLE gmeta.default.empty (k BIGINT, v BIGINT) " +
      "USING graft TBLPROPERTIES ('key'='k','statscols'='v')")
    val df = spark.sql(
      "SELECT count(*) AS n, min(v) AS mn FROM gmeta.default.empty")
    assert(localScans(df).nonEmpty && batchScans(df).isEmpty)
    val r = df.collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("scan statistics are exact: numRows and sizeInBytes from the manifest") {
    val rel = spark.table("gmeta.default.t")
    val scan = batchScans(rel).head.scan.asInstanceOf[GraftSpjScan]
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong == 1000L)
    assert(st.sizeInBytes().getAsLong > 0L)
  }

  test("the v1 path face reports exact sizeInBytes too") {
    withAqeOff {
      // same broadcast-at-planning-time contract for format("graft")
      val dim = spark.read.format("graft").load(s"$wh/default/t")
      val size = dim.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(size > 0 && size < 10L * 1024 * 1024,
        s"manifest-exact size expected, got $size")
    }
  }

  test("a small catalog table auto-broadcasts without a hint") {
    spark.sql("CREATE TABLE gmeta.default.dim (k BIGINT, name STRING) " +
      "USING graft TBLPROPERTIES ('key'='k','nbuckets'='4')")
    spark.sql("INSERT INTO gmeta.default.dim " +
      "SELECT id, concat('n', id) FROM range(0, 20)")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = spark.sql(
        """SELECT t.k, d.name FROM gmeta.default.t t
          |JOIN gmeta.default.dim d ON t.k = d.k""".stripMargin)
      val bhj = j.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.joins
          .BroadcastHashJoinExec => b
      }
      assert(bhj.nonEmpty,
        s"exact scan stats must make the 20-row side the broadcast " +
          s"side at PLANNING time:\n${j.queryExecution.executedPlan}")
      assert(j.count() == 20L)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("LIMIT keeps only a file prefix covering the limit") {
    val df = spark.table("gmeta.default.t").limit(5)
    val scan = batchScans(df).head.scan.asInstanceOf[GraftSpjScan]
    val keptFiles = scan.planInputPartitions().map {
      case p: GraftBucketPartition => p.files.size
    }.sum
    val allFiles = batchScans(spark.table("gmeta.default.t")).head
      .scan.asInstanceOf[GraftSpjScan].planInputPartitions().map {
        case p: GraftBucketPartition => p.files.size
      }.sum
    assert(keptFiles < allFiles,
      s"limit 5 should read a file prefix ($keptFiles of $allFiles)")
    assert(df.count() == 5L)
    // a filter forbids the truncation: the 142 surviving rows live in
    // the TAIL of the key range, so a naive "first files covering 5
    // raw rows" prefix would return nothing — the builder must refuse
    // the limit push when any filter was pushed
    val filtered = spark.table("gmeta.default.t")
      .where($"v" > 5000L).limit(5)
    assert(filtered.count() == 5L)
    assert(filtered.collect().forall(_.getLong(1) > 5000L))
  }

  test("parquet footer stats skip row groups on columns without zone maps") {
    withAqeOff {
      // `v` in nostats has NO manifest zone map — but parquet wrote
      // its own footer stats unasked, and the pushed filter reaches
      // the reader: an out-of-range predicate emits ZERO rows from
      // the scan (row groups skipped), not 50-rows-then-filtered
      spark.sql("CREATE TABLE gmeta.default.rg (k BIGINT, v BIGINT) " +
        "USING graft TBLPROPERTIES ('key'='k','nbuckets'='4')")
      spark.sql("INSERT INTO gmeta.default.rg " +
        "SELECT id, id * 3 FROM range(0, 50)")
      def scanRows(df: DataFrame): Long = {
        df.collect()
        batchScans(df).head.metrics("numOutputRows").value
      }
      val miss = spark.table("gmeta.default.rg").where($"v" === 100000L)
      assert(miss.count() == 0L)
      assert(scanRows(spark.table("gmeta.default.rg")
        .where($"v" === 100000L)) == 0L,
        "out-of-range predicate must skip every row group in the reader")
      val hit = spark.table("gmeta.default.rg").where($"v" === 60L)
      assert(hit.collect().map(_.getLong(0)).toSeq == Seq(20L))
    }
  }

  test(".files sub-table inventories live files from the manifest only") {
    val files = spark.sql(
      "SELECT bucket, path, bytes, rows, stats FROM gmeta.default.t.files")
    assert(localScans(files).nonEmpty, "the inventory must be a LocalScan")
    val rows = files.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) > 0L), "bytes on disk")
    assert(rows.map(_.getLong(3)).sum == 1000L,
      "per-file recorded rows must sum to the table count")
    assert(rows.forall(r => r.getString(4).contains("v:") &&
      r.getString(4).contains("s:0x")),
      s"zone-map summaries expected: ${rows.head.getString(4)}")
    // the inventory is plain SQL: aggregates compose
    val perBucket = spark.sql(
      "SELECT bucket, sum(rows) AS r FROM gmeta.default.t.files " +
        "GROUP BY bucket")
    assert(perBucket.collect().map(_.getLong(1)).sum == 1000L)
  }

  test(".history sub-table is the joinable DESCRIBE HISTORY") {
    val h = spark.sql(
      "SELECT version, operation FROM gmeta.default.t.history " +
        "ORDER BY version")
    val rows = h.collect()
    assert(rows.length >= 3, "create + two inserts at minimum")
    assert(rows.head.getLong(0) == 1L)
    assert(rows.exists(_.getString(1) == "UPSERT"))
    // composable: join history against the file inventory's totals
    val joined = spark.sql(
      """SELECT h.version, f.total FROM gmeta.default.t.history h
        |CROSS JOIN (SELECT sum(rows) AS total
        |            FROM gmeta.default.t.files) f
        |WHERE h.version = (SELECT max(version)
        |                   FROM gmeta.default.t.history)"""
        .stripMargin).collect()
    assert(joined.length == 1 && joined.head.getLong(1) == 1000L)
  }

  test("optimize(zorder) and split procedures run from SQL") {
    spark.sql("CREATE TABLE gmeta.default.z (k BIGINT, v BIGINT) " +
      "USING graft TBLPROPERTIES ('key'='k','nbuckets'='4'," +
      "'statscols'='v')")
    spark.sql("INSERT INTO gmeta.default.z " +
      "SELECT id, id * 11 FROM range(0, 2000)")
    val opt = spark.sql(
      "CALL gmeta.system.optimize(tbl => 'default.z', zorder => 'v')")
      .collect().head
    assert(opt.getInt(0) == 4, "zorder rewrites EVERY bucket")
    assert(spark.table("gmeta.default.z").count() == 2000L)
    val sp = spark.sql(
      "CALL gmeta.system.split(tbl => 'default.z', factor => 2)")
      .collect().head
    assert(sp.getInt(0) == 8, "4 buckets * 2")
    assert(spark.table("gmeta.default.z").count() == 2000L)
    // post-split table still answers metadata aggregates
    val agg = spark.sql(
      "SELECT count(*) AS n, max(v) AS mx FROM gmeta.default.z")
    val r = agg.collect().head
    assert(r.getLong(0) == 2000L && r.getLong(1) == 11L * 1999)
  }

  test("r23_metadata_agg plans metadata-only against the staged corpus store") {
    val df = graft.SparkEntry.queries("r23_metadata_agg")(
      spark, graft.QueryHarness.sf0001)
    assert(localScans(df).nonEmpty && batchScans(df).isEmpty,
      s"r23 must answer from the manifest:\n" +
        df.queryExecution.executedPlan)
    val r = df.collect().head
    assert(r.getLong(0) > 0L && r.getLong(2) > r.getLong(1))
    assert(r.getString(3).startsWith("1-") && r.getString(4).startsWith("5-"),
      "priority bounds '1-URGENT'..'5-LOW' expected from the BinStat order")
  }

  test("r24_split_agg plans the GROUPED aggregate metadata-only") {
    val rows = withAqeOff {
      val df = graft.SparkEntry.queries("r24_split_agg")(
        spark, graft.QueryHarness.sf0001)
      assert(localScans(df).nonEmpty && batchScans(df).isEmpty,
        s"r24 must answer from the manifest:\n" +
          df.queryExecution.executedPlan)
      df.collect()
    }
    assert(rows.length == 5, "five o_orderpriority groups")
    assert(rows.map(_.getLong(1)).sum > 0L)
    assert(rows.forall(r => r.getLong(1) == r.getLong(2)),
      "o_custkey has no nulls, so count(col) == count(*) per group")
  }

  test("r25_filtered_meta_agg plans metadata-only (exact pushdown)") {
    val rows = withAqeOff {
      val df = graft.SparkEntry.queries("r25_filtered_meta_agg")(
        spark, graft.QueryHarness.sf0001)
      assert(localScans(df).nonEmpty && batchScans(df).isEmpty,
        s"r25 must answer from the manifest:\n" +
          df.queryExecution.executedPlan)
      df.collect()
    }
    val r = rows.head
    assert(r.getLong(0) > 0L && r.getLong(0) == r.getLong(1))
  }

  test("SET TBLPROPERTIES + analyze retrofits stats without rewriting data") {
    withAqeOff {
      // born without any index declaration, data already written
      spark.sql("CREATE TABLE gmeta.default.retro (k BIGINT, v BIGINT) " +
        "USING graft TBLPROPERTIES ('key'='k','nbuckets'='4')")
      spark.sql("INSERT INTO gmeta.default.retro " +
        "SELECT id, id * 13 FROM range(0, 400)")
      val filesBefore = spark.sql(
        "SELECT path FROM gmeta.default.retro.files")
        .as[String].collect().toSet

      spark.sql("ALTER TABLE gmeta.default.retro " +
        "SET TBLPROPERTIES ('statscols'='v')")
      // declared but not yet harvested: falls back to the scan
      val before = spark.sql("SELECT max(v) AS mx FROM gmeta.default.retro")
      assert(batchScans(before).nonEmpty)
      assert(before.collect().head.getLong(0) == 13L * 399)

      val r = spark.sql(
        "CALL gmeta.system.analyze(tbl => 'default.retro')")
        .collect().head
      assert(r.getInt(0) > 0, "existing files should need harvesting")
      // now metadata-only — and the DATA FILES are byte-identical
      val after = spark.sql(
        "SELECT count(*) AS n, max(v) AS mx FROM gmeta.default.retro")
      assert(localScans(after).nonEmpty && batchScans(after).isEmpty,
        "analyze must make metadata answering live:\n" +
          after.queryExecution.executedPlan)
      val row = after.collect().head
      assert(row.getLong(0) == 400L && row.getLong(1) == 13L * 399)
      val filesAfter = spark.sql(
        "SELECT path FROM gmeta.default.retro.files")
        .as[String].collect().toSet
      assert(filesAfter == filesBefore, "ANALYZE must not rewrite data")
      // idempotent: a second run finds nothing to do
      val again = spark.sql(
        "CALL gmeta.system.analyze(tbl => 'default.retro')")
        .collect().head
      assert(again.getInt(0) == 0 && again.getInt(1) == 0)

      // bloom retrofit follows the same path: declare, backfill,
      // every live file gets its sidecar without being rewritten
      spark.sql("ALTER TABLE gmeta.default.retro " +
        "SET TBLPROPERTIES ('bloomcols'='k')")
      val withBloom = spark.sql(
        "CALL gmeta.system.analyze(tbl => 'default.retro')")
        .collect().head
      assert(withBloom.getInt(1) == filesBefore.size,
        "one sidecar per live file")
      val dataDir = new java.io.File(s"$wh/default/retro")
      filesBefore.foreach { rel =>
        assert(new java.io.File(dataDir, s"$rel.bloom-k").isFile,
          s"missing sidecar for $rel")
      }
    }
  }

  test("statscols survives an empty CREATE, maintenance, and shows in properties") {
    // created with statscols, first INSERT long after: the property
    // came from the manifest, not from any file's existing stats
    val props = spark.sql("SHOW TBLPROPERTIES gmeta.default.t")
      .as[(String, String)].collect().toMap
    assert(props.get("statscols").contains("k,v,s"))
    // maintenance (OPTIMIZE compaction) re-harvests the same columns
    spark.sql("CALL gmeta.system.optimize(\"default.t\")")
    val df = spark.sql(
      "SELECT min(v) AS mn, max(s) AS mx FROM gmeta.default.t")
    assert(localScans(df).nonEmpty && batchScans(df).isEmpty,
      "zone maps must survive compaction for metadata answering")
    val r = df.collect().head
    assert(r.getLong(0) == -1000L && r.getString(1) == "s0999")
  }

  test("GROUP BY a value-pure split column answers from the manifest") {
    spark.sql("CREATE TABLE gmeta.default.g (k BIGINT, grp BIGINT, " +
      "s STRING) USING graft " +
      "TBLPROPERTIES ('key'='k','nbuckets'='4','statscols'='k,grp,s')")
    spark.sql("INSERT INTO gmeta.default.g " +
      "SELECT id, id % 4, concat('v', id % 4) FROM range(0, 800)")
    spark.sql("CALL gmeta.system.optimize(tbl => 'default.g', " +
      "zorder => 'grp', split_by => 'grp')")
    val df = spark.sql(
      "SELECT grp, count(*) AS n, count(s) AS ns, min(k) AS mnk, " +
        "max(k) AS mxk FROM gmeta.default.g GROUP BY grp")
    assert(localScans(df).nonEmpty && batchScans(df).isEmpty,
      s"expected a manifest-only grouped plan:\n" +
        s"${df.queryExecution.executedPlan}")
    val rows = df.orderBy("grp").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.forall(r => r.getLong(1) == 200L && r.getLong(2) == 200L))
    assert(rows.map(r => (r.getLong(0), r.getLong(3))).toSeq ==
      Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L)))
    assert(rows.map(_.getLong(4)).toSeq ==
      Seq(796L, 797L, 798L, 799L))
    // string group keys push down through the same proof
    val sg = spark.sql("SELECT s, count(*) AS n FROM gmeta.default.g " +
      "GROUP BY s")
    // s was not the split column — but it is 1:1 with grp, so every
    // split file is value-pure on it too (min == max, zero nulls)
    assert(localScans(sg).nonEmpty && batchScans(sg).isEmpty)
    assert(sg.collect().map(_.getLong(1)).forall(_ == 200L))
  }

  test("GROUP BY an impure column falls back to the scan, same rows") {
    // k varies within every file — never value-pure
    withAqeOff {
      val df = spark.sql("SELECT k % 2 AS par, count(*) AS n " +
        "FROM gmeta.default.g GROUP BY k % 2")
      assert(batchScans(df).nonEmpty,
        "impure grouping must take the data path")
      assert(df.collect().map(_.getLong(1)).sum == 800L)
    }
  }

  test("exact filter on the split column: residual-free scan, no " +
      "Filter node, rows correct") {
    withAqeOff {
      val df = spark.sql("SELECT k FROM gmeta.default.g WHERE grp = 3")
      val filters = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FilterExec => f
      }
      assert(filters.isEmpty,
        s"the proven conjunction needs no residual Filter:\n" +
          df.queryExecution.executedPlan)
      assert(df.collect().length == 200)
      // and the values really are the predicate's rows
      assert(df.collect().forall(_.getLong(0) % 4 == 3))
    }
  }

  test("FILTERED aggregates answer from the manifest when the filter " +
      "proves whole files") {
    val rows = withAqeOff {
      val df = spark.sql("SELECT count(*) AS n, count(s) AS ns, " +
        "min(k) AS mn, max(k) AS mx " +
        "FROM gmeta.default.g WHERE grp = 3")
      assert(localScans(df).nonEmpty && batchScans(df).isEmpty,
        s"filtered aggregate must be manifest-only:\n" +
          df.queryExecution.executedPlan)
      df.collect()
    }
    val r = rows.head
    assert(r.getLong(0) == 200L && r.getLong(1) == 200L)
    assert(r.getLong(2) == 3L && r.getLong(3) == 799L)
    // grouped + filtered compose too
    val g = withAqeOff {
      val df = spark.sql("SELECT grp, count(*) AS n " +
        "FROM gmeta.default.g WHERE grp >= 2 GROUP BY grp")
      assert(localScans(df).nonEmpty && batchScans(df).isEmpty)
      df.collect()
    }
    assert(g.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((2L, 200L), (3L, 200L)))
  }

  test("an unprovable filter keeps the conservative contract") {
    withAqeOff {
      // k straddles every file — residual Filter stays, agg takes
      // the data path, rows stay correct
      val df = spark.sql("SELECT count(*) AS n " +
        "FROM gmeta.default.g WHERE k < 100")
      assert(batchScans(df).nonEmpty,
        "straddling predicate must scan")
      assert(df.collect().head.getLong(0) == 100L)
      val sel = spark.sql("SELECT k FROM gmeta.default.g WHERE k < 100")
      val filters = sel.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FilterExec => f
      }
      assert(filters.nonEmpty, "residual Filter must re-apply")
    }
  }

  test("count(col) = rows minus recorded nulls, ungrouped") {
    val df = spark.sql(
      "SELECT count(*) AS n, count(s) AS ns FROM gmeta.default.g")
    assert(localScans(df).nonEmpty && batchScans(df).isEmpty)
    val r = df.collect().head
    assert(r.getLong(0) == 800L && r.getLong(1) == 800L)
  }
}
