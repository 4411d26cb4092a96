package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** n18 at probe scale: `N18Probe <nVecs> <workDir> [nBuckets]`.
  *
  * Generates a deterministic nVecs-row embeddings corpus into workDir
  * (ScaleProbe's hash-derived generator, embeddings only — n18 never
  * touches documents/events), then times the maintenance loop's
  * stages against the full frozen-model rebuild:
  *   seed        — base encode (vec_id%10 < 8) merged into the table
  *   delta_10pct — one insert batch (vec_id%10 = 8), ~10% of corpus
  *   delta_small — a trickle batch (vec_id%1000 = 999), ~0.1%
  *   compact     — inline small-files maintenance (the recipe's
  *                 every-2nd-delta discipline; bounds files/bucket)
  *   delete_defer— tombstone wave (vec_id%13 = 0) APPENDED to the
  *                 log in O(delta) — the round-10 eager wave hashed
  *                 into every bucket (= full table rewrite)
  *   delete_apply— lazy rewrite of only the dirt-threshold buckets
  *   read_merged — composed read (base anti-join pending tombstones)
  *   delete_eager— the old all-buckets arm, kept for the comparison
  *   rebuild     — full pqEncode + one-shot write (the thing
  *                 incremental maintenance avoids)
  * After every stage the manifest's max files/bucket prints — the
  * bounded-small-files evidence the compaction discipline claims.
  * Methodology follows ScaleProbe's enforced lessons: a generation
  * batch refuses to measure (exit 2), and each stage's first sample
  * is discarded (min of two steady-state runs reported). Model
  * training cost is printed separately — it is the REGISTRY's cost,
  * paid once per corpus fingerprint, not per batch.
  */
object N18Probe {
  private def lcg(x0: Long): Long =
    x0 * 6364136223846793005L + 1442695040888963407L

  private def generate(spark: SparkSession, nVecs: Long, dir: String): Boolean = {
    import spark.implicits._
    val marker = new java.io.File(dir, s"_GEN_EMB_$nVecs")
    if (marker.isFile) return false
    spark.range(nVecs).map { jid =>
      val id: Long = jid
      var st = lcg(id ^ 0x5deece66dL)
      val e = Array.fill(64) {
        st = lcg(st)
        ((st >>> 11).toDouble / (1L << 52).toDouble - 1.0).toFloat
      }
      (id, e, (id % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    marker.createNewFile()
    true
  }

  def main(args: Array[String]): Unit = {
    val nVecs = args(0).toLong
    val dir = args(1)
    val nBuckets = if (args.length > 2) args(2).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (generate(spark, nVecs, dir) &&
        !sys.env.get("SPARK_GRAFT_COLD_OK").contains("1")) {
      println(s"corpus generated into $dir — re-run for warm " +
        "measurements (SPARK_GRAFT_COLD_OK=1 to measure cold reads)")
      spark.stop()
      sys.exit(2)
    }

    val t0 = System.nanoTime()
    graft.llm.KMeans.fit(spark, dir)
    graft.llm.PQ.fit(spark, dir)
    println(f"models (registry-cached after first run): ${(System.nanoTime() - t0) / 1e9}%.2f s")

    val t = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val M = graft.llm.PQ.M
    val codeCols = (0 until M).map(j => col(s"code$j"))
    val combine = (df: DataFrame) => df.groupBy("vec_id")
      .agg(max(struct(col("cid") +: codeCols: _*)).as("__v"))
      .select(col("vec_id") +: (col("__v.cid").as("cid") +:
        (0 until M).map(j => col(s"__v.code$j").as(s"code$j"))): _*)

    var table = ""
    def filesPerBucket(): String =
      graft.pol.PoolJsonSink.readManifest(table) match {
        case Some(m) if m.buckets.nonEmpty =>
          val sizes = m.buckets.values.map(_.size)
          s"files/bucket max=${sizes.max} buckets=${m.buckets.size}"
        case _ => ""
      }
    def timed(name: String)(body: => Unit): Unit = {
      // stage semantics are stateful (each merge advances the table),
      // so per-stage min-of-N is not replayable: discard a throwaway
      // table's first run instead via the jit warm below
      val s0 = System.nanoTime()
      body
      println(f"$name%-14s ${(System.nanoTime() - s0) / 1e9}%8.2f s  " +
        filesPerBucket())
    }

    // one discarded maintenance cycle on a tiny slice: compiles every
    // codegen stage the measured cycle uses (the per-query JIT lesson)
    locally {
      val warm = java.nio.file.Files
        .createTempDirectory("graft_n18p_warm_").toString + "/idx"
      val w0 = System.nanoTime()
      graft.pol.PoolJsonSink.mergeDelta(spark, warm,
        graft.llm.SimilarityQueries.pqEncode(spark, dir,
          t.where(col("vec_id") % 10000 === 7)),
        col("vec_id"), nBuckets)(combine)
      graft.pol.PoolJsonSink.deletePartitioned(spark, warm,
        t.where(col("vec_id") % 20000 === 7).select("vec_id"),
        col("vec_id"), nBuckets)
      println(f"[jit-warm] cycle ${(System.nanoTime() - w0) / 1e9}%.2f s (discarded)")
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft_n18p_").toString
    table = root + "/idx"
    val tomb = root + "/tomb"
    timed("seed_80pct") {
      graft.pol.PoolJsonSink.mergeDelta(spark, table,
        graft.llm.SimilarityQueries.pqEncode(spark, dir,
          t.where(col("vec_id") % 10 < 8)),
        col("vec_id"), nBuckets)(combine)
    }
    timed("delta_10pct") {
      graft.pol.PoolJsonSink.mergeDelta(spark, table,
        graft.llm.SimilarityQueries.pqEncode(spark, dir,
          t.where(col("vec_id") % 10 === 8)),
        col("vec_id"), nBuckets)(combine)
    }
    timed("delta_small") {
      graft.pol.PoolJsonSink.mergeDelta(spark, table,
        graft.llm.SimilarityQueries.pqEncode(spark, dir,
          t.where(col("vec_id") % 1000 === 999)),
        col("vec_id"), nBuckets)(combine)
    }
    // a true trickle (~nVecs/100k keys): FEWER keys than buckets, so
    // touched buckets ≪ table and the merge's O(delta + touched
    // buckets) contract is visible — a delta that hashes into every
    // bucket rewrites the whole table no matter how small it is,
    // which is the "size nBuckets with the table" story MergeProbe
    // measured (more buckets → thinner touched buckets → cheaper)
    timed("delta_trickle") {
      graft.pol.PoolJsonSink.mergeDelta(spark, table,
        graft.llm.SimilarityQueries.pqEncode(spark, dir,
          t.where(col("vec_id") % 100000 === 7)),
        col("vec_id"), nBuckets)(combine)
    }
    timed("compact") {
      graft.pol.PoolJsonSink.compactPartitions(spark, table,
        maxFilesPerPartition = 2)
      graft.pol.PoolJsonSink.vacuum(table)
    }
    val doomed = t.where(col("vec_id") % 13 === 0).select("vec_id")
    // the LOG keeps its own small bucket count (the recipe's default):
    // it is tombstone-sized, and inheriting the data table's nBuckets
    // made the first append stage nBuckets tiny files — measured
    // 23.5 s at 1024 buckets vs the eager delete's 14.6 s, i.e. the
    // defer LOST until the log stopped copying the data table's shape
    timed("delete_defer") {
      graft.pol.TombstoneLog.append(spark, tomb, doomed)
    }
    // threshold sized so a SPRAYED wave (~7.7% of keys, uniform over
    // buckets) leaves most buckets under it: 2x the expected
    // tombstones per bucket
    val dirt = math.max(2L, 2L * nVecs / 13 / nBuckets)
    var applied: Seq[Long] = Nil
    timed("delete_apply") {
      applied = graft.pol.TombstoneLog.applyTo(spark, table, tomb, dirt)
    }
    println(s"delete_apply rewrote ${applied.size} of $nBuckets " +
      s"buckets (dirt threshold $dirt)")
    timed("read_merged") {
      graft.pol.TombstoneLog.readMinus(spark, table, tomb, "vec_id")
        .agg(count(org.apache.spark.sql.functions.lit(1))).head()
    }
    timed("delete_eager") {
      graft.pol.PoolJsonSink.deletePartitioned(spark, table,
        doomed, col("vec_id"), nBuckets)
    }
    timed("rebuild_full") {
      val out = java.nio.file.Files
        .createTempDirectory("graft_n18p_rb_").toString + "/idx"
      graft.llm.SimilarityQueries.pqEncode(spark, dir, t)
        .write.mode("overwrite").parquet(out)
    }
    val rows = graft.pol.TombstoneLog
      .readMinus(spark, table, tomb, "vec_id").count()
    println(s"maintained table rows: $rows over $nVecs vectors")
    spark.stop()
  }
}
