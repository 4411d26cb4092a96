package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** The queryable advisory surface (round-11 verdict item 3): fired
  * advisories accumulate in [[Advisories]] and surface through the
  * oracle-gated `r26_advisories` catalog query — a 100-TB pipeline's
  * orchestrator reads tables, not executor logs. On healthy
  * default-dial testdata the relation is deterministically EMPTY
  * (computed: the query re-evaluates the census families); on a
  * saturated fixture the family's row appears with its measured
  * signal and computed re-dial.
  */
class AdvisorySurfaceSpec extends AnyFunSuite {
  import graft.QueryHarness._

  /** DedupRecallAdvisorySpec's saturated fixture shape. */
  private def saturatedCorpus(tag: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_advsurf_${tag}_").toString
    import spark.implicits._
    val dup = (0 until 120).map { i =>
      val g = i / 4
      val text = (0 until 12).map(k => s"$tag${g}tok${k}g$g").mkString(" ")
      (i.toLong, text, "en", s"srcdup$g", 100L)
    }
    val uniq = (0 until 10).map { i =>
      val text = (0 until 12).map(k => s"uniq${i}tok${k}u$i").mkString(" ")
      (120 + i.toLong, text, "en", s"src$i", 90L)
    }
    (dup ++ uniq).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("r26 is wired with an oracle and is EMPTY on healthy testdata") {
    assert(graft.SparkEntry.queries.contains("r26_advisories"))
    assert(graft.SparkEntry.oracleSql.contains("r26_advisories"))
    val out = graft.SparkEntry.queries("r26_advisories")(spark, sf001)
    assert(out.columns.toSeq ==
      Seq("family", "corpus", "signal", "redial", "ordinal"))
    assert(out.count() == 0L,
      "no advisory condition holds on default-dial testdata")
    assert(graft.SparkEntry.queries("r26_advisories")(spark, sf0001)
      .count() == 0L)
  }

  test("a fired dedup-recall advisory surfaces as a row naming the preset") {
    val dir = saturatedCorpus("lsh")
    val rows = graft.SparkEntry.queries("r26_advisories")(spark, dir)
      .collect()
    val r = rows.find(_.getString(0) == "dedup_lsh_cap")
      .getOrElse(fail(s"no dedup_lsh_cap row in ${rows.mkString(";")}"))
    assert(r.getString(1) == dir)
    assert(r.getDouble(2) > 0.7, s"signal=${r.getDouble(2)}")
    assert(r.getString(3).contains("graft.dedup.profile=recall"))
    assert(r.getLong(4) > 0L)
  }

  test("a fired block-cap advisory surfaces with its computed re-dial") {
    // one 1100-doc source over the default BlockCap (the
    // FamilyRecallAdvisorySpec fixture shape)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_advsurf_block_").toString
    import spark.implicits._
    val big = (0 until 1100).map { i =>
      (i.toLong, s"crawl doc $i with words $i", "en", "megacrawl", 30L)
    }
    val uniq = (0 until 50).map { i =>
      (1100 + i.toLong, s"unique doc $i", "en", s"src$i", 20L)
    }
    (big ++ uniq).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("r26_advisories")(spark, dir)
      .collect()
    val r = rows.find(_.getString(0) == "dedup_block_cap")
      .getOrElse(fail(s"no dedup_block_cap row in ${rows.mkString(";")}"))
    assert(r.getDouble(2) > 0.9)
    assert(r.getString(3).contains("graft.dedup.block_cap=") ||
      r.getString(3).contains("capped-LSH"))
  }

  test("the registry dedupes per (family, corpus) with stable ordinals") {
    val dir = saturatedCorpus("dup")
    val first = graft.SparkEntry.queries("r26_advisories")(spark, dir)
      .collect().toSeq
    val second = graft.SparkEntry.queries("r26_advisories")(spark, dir)
      .collect().toSeq
    assert(first == second, "re-evaluation must not re-record or renumber")
    assert(first.map(r => (r.getString(0), r.getString(1))).distinct
      .size == first.size)
  }

  test("SHOW ADVISORIES via SQL: <cat>.system.advisories serves the registry") {
    val dir = saturatedCorpus("sql")
    // fire the dedup advisory for this corpus
    assert(DedupQueries.maybeWarnDedupRecall(spark, dir))
    val cat = "gadv_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    val wh = java.nio.file.Files
      .createTempDirectory("graft_adv_wh_").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      val rows = spark.sql(
        s"""SELECT family, signal, redial FROM $cat.system.advisories
           |WHERE corpus = '$dir' ORDER BY family""".stripMargin)
        .collect()
      assert(rows.exists(_.getString(0) == "dedup_lsh_cap"),
        s"rows=${rows.mkString(";")}")
      val r = rows.find(_.getString(0) == "dedup_lsh_cap").get
      assert(r.getDouble(1) > 0.7)
      assert(r.getString(2).contains("graft.dedup.profile=recall"))
      // filtered to a healthy corpus: empty through plain SQL too
      assert(spark.sql(
        s"""SELECT * FROM $cat.system.advisories
           |WHERE corpus = '$sf001'""".stripMargin).isEmpty)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  test("advisories for one corpus never leak into another's relation") {
    val dir = saturatedCorpus("leak")
    assert(graft.SparkEntry.queries("r26_advisories")(spark, dir)
      .count() >= 1L)
    assert(graft.SparkEntry.queries("r26_advisories")(spark, sf001)
      .count() == 0L)
  }

  test("fired advisories survive a process restart and retire with the corpus") {
    val dir = saturatedCorpus("dur")
    assert(DedupQueries.maybeWarnDedupRecall(spark, dir))
    assert(Advisories.forCorpus(dir).exists(_.family == "dedup_lsh_cap"))
    // simulate a fresh process: wipe the in-memory registry; the next
    // read reloads the durable log (the staleness advisory's whole
    // point — its firing run and the operator's SELECT are different
    // processes)
    Advisories.clear()
    assert(Advisories.forCorpus(dir).exists(_.family == "dedup_lsh_cap"),
      "durable log must reload the firing")
    // regenerate the corpus (any member-file change): the stored
    // fingerprint no longer matches, so the persisted advisory
    // RETIRES instead of lying about a corpus it never measured
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/documents.parquet/extra.marker"),
      "regen".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Advisories.clear()
    assert(!Advisories.forCorpus(dir).exists(_.family == "dedup_lsh_cap"),
      "a regenerated corpus must not serve a stale advisory")
  }
}
