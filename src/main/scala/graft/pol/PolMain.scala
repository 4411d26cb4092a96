package graft.pol

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** CLI batch entry point — the analog of the reference's
  * `python etl/main.py [--all]` (`etl/main.py:154-165`): scan → parse →
  * metrics → documents → summary, printed/written from one Spark job.
  *
  * Usage: PolMain <pol-root> [lookup-csv-or-xlsx] [out-dir]
  *          [--incremental <ckpt-dir> | --ledger <ledger-path>
  *           | --git-diff <repo-root>]
  *
  * With `--incremental` the run uses the streaming changed-files mode
  * (entry point 2): only files the checkpoint has not seen are
  * processed and upserted — a fresh checkpoint dir degrades to the
  * full scan, exactly like the reference's empty-diff fallback.
  * With `--ledger` the run uses the git-diff-faithful variant instead:
  * new AND modified files are reprocessed (ChangedFiles).
  */
object PolMain {
  def main(args: Array[String]): Unit = {
    val incIdx = args.indexOf("--incremental")
    val ckpt = if (incIdx >= 0) Some(args(incIdx + 1)) else None
    val ledIdx = args.indexOf("--ledger")
    val ledgerPath = if (ledIdx >= 0) Some(args(ledIdx + 1)) else None
    val gitIdx = args.indexOf("--git-diff")
    val gitRepo = if (gitIdx >= 0) Some(args(gitIdx + 1)) else None
    val dropped = Seq(incIdx, ledIdx, gitIdx).filter(_ >= 0)
      .flatMap(i => Seq(i, i + 1)).toSet
    val pos = args.zipWithIndex.filterNot(z => dropped(z._2)).map(_._1)
    val root = pos.headOption.getOrElse("/root/reference/samples/pools2")
    val lookupCsv = pos.lift(1)
      .getOrElse("src/test/resources/lookup/game_lookup.csv")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pol")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    ckpt match {
      case Some(ckptDir) =>
        val out = pos.lift(2).getOrElse("/tmp/graft_polmain")
        val n = PolPipeline.processChanged(spark, root, lookupCsv,
          java.nio.file.Paths.get(out).resolve("all_pools_data.json"), ckptDir)
        println(s"incremental run: processed $n new file(s) into $out")
        spark.stop()
        return
      case None =>
    }
    // --git-diff <repoRoot>: the reference's literal CI mode — discover
    // changed .pol files via `git diff --name-only HEAD~1 HEAD` under
    // samples/pools2, full-scan fallback on an empty diff.
    gitRepo match {
      case Some(repoRoot) =>
        val out = pos.lift(2).getOrElse("/tmp/graft_polmain")
        val n = graft.streaming.ChangedFiles.runGit(
          spark, repoRoot, "samples/pools2", lookupCsv,
          java.nio.file.Paths.get(out).resolve("all_pools_data.json"))
        println(s"git-diff run: processed $n changed file(s) into $out")
        spark.stop()
        return
      case None =>
    }
    ledgerPath match {
      case Some(ledger) =>
        val out = pos.lift(2).getOrElse("/tmp/graft_polmain")
        val n = PolPipeline.processChangedLedger(spark, root, lookupCsv,
          java.nio.file.Paths.get(out).resolve("all_pools_data.json"), ledger)
        println(s"ledger run: processed $n new/modified file(s) into $out")
        spark.stop()
        return
      case None =>
    }

    val dim = GameLookup.load(spark, lookupCsv)
    // parse with ride-along error accounting (A8): drop counts surface
    // from the same scan via observe(), printed when actions complete
    val parsed = PolParser.parseObserved(PolParser.readRaw(spark, root))
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            d: Long): Unit =
          qe.observedMetrics.get("graft_parse").foreach { m =>
            println(s"[parse] lines seen=${m.getAs[Long]("lines_seen")} " +
              s"parsed=${m.getAs[Long]("lines_parsed")} " +
              s"dropped=${m.getAs[Long]("lines_dropped")}")
          }
        override def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })
    // File inventory: 0-byte / all-unparseable files still get size-0
    // documents and count in the summary (reference parity).
    val inventory = PolParser.listFiles(spark, root)
    // One row per file: persist so the sinks/summary don't re-run the
    // full-corpus parse per action.
    val pools = PoolMetrics.perPool(parsed, dim, Some(inventory)).persist()
    val docs = PoolMetrics.documents(pools)

    docs.select("pool_name", "pool_id", "pool_type", "min_bet", "rtp",
        "volatility", "size", "tag", "is_flat", "max_multiplier")
      .orderBy("pool_name")
      .show(50, truncate = false)
    PoolSummary.aggregate(docs).show(truncate = false)

    pos.lift(2).foreach { out =>
      val outDir = java.nio.file.Paths.get(out)
      val rows = docs.orderBy(col("metadata.source_file")).collect().toSeq
      val ts = java.time.OffsetDateTime.now(java.time.ZoneOffset.UTC)
        .truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
        .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)
      val n = PoolJsonSink.upsert(rows, outDir.resolve("all_pools_data.json"))
      val agg = PoolSummary.aggregate(docs, Some(ts)).collect()(0)
      PoolJsonSink.writeSummary(
        PoolJsonSink.summaryJson(ts, n, n, 0, Seq.empty,
          Seq("Meta_data/all_pools_data.json"), agg),
        outDir.resolve("_pipeline_summary.json"))
      PoolJsonSink.writeIndex(rows, ts, outDir.resolve("_index.json"))
      PoolJsonSink.writeCsv(docs, s"$out/summary_csv")
      println(s"wrote $n documents + summary + index + csv under $out")
    }
    spark.stop()
  }
}
