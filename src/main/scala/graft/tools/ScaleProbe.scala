package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment harness: `ScaleProbe <nDocs> <workDir> [query ...]`.
  *
  * Deterministically generates an nDocs-row `documents.parquet` into
  * workDir (same schema as the testdata table: doc_id, text, lang,
  * source, n_chars; ~60-word zipf-ish texts with a planted near-dup
  * per 50 docs) and times the named catalog queries over it (default:
  * the dedup/curation family). Measures how the operators scale with
  * corpus size — the local evidence behind SCALING.md's claims, at
  * 10–100× the driver testdata sizes.
  *
  * Generation is hash-derived per doc_id (no RNG state), so any two
  * runs — at any parallelism — produce the identical corpus.
  */
object ScaleProbe {
  private val vocab: Array[String] = Array(
    "table", "row", "data", "query", "join", "scan", "key", "value",
    "agg", "slow", "fast", "small", "large", "batch", "window", "spark",
    "order", "column", "part", "hash", "sort", "merge", "filter",
    "shuffle", "cache", "spill", "codegen", "plan", "stage", "task",
    "executor")

  private def lcg(x0: Long): Long = x0 * 6364136223846793005L + 1442695040888963407L

  /** Words for doc `base`: 60 draws from a skewed vocab distribution. */
  private def words(base: Long): Array[String] = {
    var st = lcg(base ^ 0x9e3779b97f4a7c15L)
    Array.fill(60) {
      st = lcg(st)
      // square the uniform to skew toward low indices (zipf-ish)
      val u = ((st >>> 11).toDouble / (1L << 53).toDouble)
      vocab(((u * u) * vocab.length).toInt.min(vocab.length - 1))
    }
  }

  /** Generate the deterministic corpus (documents + embeddings) into
    * `dir` — shared by the measured run and the warm-up mini-corpus.
    * Returns true if it actually generated (vs found an existing
    * corpus): a corpus written THIS invocation reads back cold, and
    * growth tables must never mix cold and warm rows (measured: d7
    * 155 s in the generation batch vs ~101 s warm at 16M).
    */
  private def generate(spark: SparkSession, nDocs: Long, dir: String): Boolean = {
    import spark.implicits._
    // generation is deterministic per (nDocs), so an existing corpus
    // of the same size is bit-identical — skip the rewrite. Keeping
    // file mtimes stable is also what lets the KMeans/PQ model
    // registry (fingerprint-keyed) serve across probe invocations.
    val marker = new java.io.File(dir, s"_GEN_$nDocs")
    if (marker.isFile) return false
    val docs = spark.range(nDocs).map { jid =>
      val id: Long = jid
      // a planted near-dup every 50 docs: doc 50k+1 = doc 50k with one
      // word swapped, exercising minhash/LSH/cc at generation scale
      val base = if (id % 50 == 1) id - 1 else id
      val ws = words(base)
      if (id % 50 == 1) ws(7) = vocab((id % vocab.length).toInt)
      val text = ws.mkString(" ")
      (id, text, "en", s"src${id % 20}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // n4 needs embeddings: hash-derived 64-dim floats, nDocs/10 rows
    spark.range(math.max(nDocs / 10, 10L)).map { jid =>
      val id: Long = jid
      var st = lcg(id ^ 0x5deece66dL)
      val e = Array.fill(64) {
        st = lcg(st)
        ((st >>> 11).toDouble / (1L << 52).toDouble - 1.0).toFloat
      }
      (id, e, (id % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // w2/r20 need events: nDocs rows, ~100 events per user so the
    // per-user window stays bounded as the corpus grows (users scale
    // with data — the real shape), raw nanos LONG ts like the testdata
    val types = Array("view", "click", "purchase", "signup", "error")
    spark.range(nDocs).map { jid =>
      val id: Long = jid
      val st = lcg(id ^ 0x2545f4914f6cdd1dL)
      val value = ((st >>> 11) % 20000L).toDouble / 100.0
      (id, 1704067200000000000L + id * 7001L * 1000L,
        id % math.max(nDocs / 100, 10L),
        types(((st >>> 3) % types.length).toInt.abs), value, """{"k": 1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    marker.createNewFile()
    true
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toLong
    val workDir = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq
      // d3 (uncapped LSH) is deliberately absent: it is quadratic in
      // bucket width and this corpus is collision-heavy (317 s at 1M
      // docs — the measurement that motivated d7). Name it explicitly
      // to reproduce that number.
      else Seq("d1_dedup_exact", "d2_minhash_signatures",
        "d7_lsh_bucket_cap", "d5_simhash", "c1_dedup_clusters",
        "c2_hash_split", "c3_quota_sample", "x4_fingerprint",
        "x5_repetition", "x6_pii_redact", "n4_embedding_quantize",
        "c6_mixture_sample", "c7_pack_sequences", "x11_dup_spans",
        "t6_stream_upsert")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- corpus generation (distributed, deterministic per doc_id) ---
    // REFUSE to report numbers from the batch that generated the
    // corpus: freshly-written files read back cold, and the growth
    // rows those reads produce are not comparable with warm ones
    // (SCALING.md's lesson #2: d7 155 s cold vs ~101 s warm at 16M).
    // Generation is persisted and marker-gated, so the re-run costs
    // only the measurement itself. SPARK_GRAFT_COLD_OK=1 overrides
    // for deliberate cold-read studies.
    if (generate(spark, nDocs, workDir) &&
        !sys.env.get("SPARK_GRAFT_COLD_OK").contains("1")) {
      println(s"corpus generated into $workDir — re-run the same " +
        "command for warm measurements (this batch would read cold; " +
        "set SPARK_GRAFT_COLD_OK=1 to measure cold reads on purpose)")
      spark.stop()
      sys.exit(2)
    }

    // --- timings: warm once on a mini-corpus derived from workDir
    // (self-contained — no dependence on this box's testdata layout),
    // then best-of-2 at scale. Warm-up failures are real failures of
    // the same code path the measured run will take — surface them.
    val warmDir = s"$workDir/warmup"
    generate(spark, 1000L, warmDir)
    names.foreach { q =>
      try graft.Bench.force(graft.SparkEntry.queries(q)(spark, warmDir))
      catch {
        case e: Throwable =>
          System.err.println(s"[warmup] $q failed: ${e.getMessage}")
      }
    }
    // The mini-corpus warmup compiles the query shapes but does NOT
    // amortize the one-off at-scale JIT/compilation tax the FIRST
    // at-scale execution of EACH query pays (SCALING.md's lesson #1,
    // measured 25-45 s by A/B-ing the batch order at 16M; round 9's
    // single global discard still left residual first-sample tax on
    // queries with disjoint codegen stages — m7's 22.7 s first batch
    // vs 14.7 s steady). So: PER QUERY, one discarded at-scale
    // execution (printed, so residual tax stays visible), then the
    // reported number is the min of two steady-state runs.
    val results = names.map { q =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.Bench.force(graft.SparkEntry.queries(q)(spark, workDir))
        (System.nanoTime() - t0) / 1e9
      }
      val discarded =
        try once()
        catch { case e: Throwable =>
          System.err.println(s"[jit-warm] $q failed: ${e.getMessage}")
          Double.NaN
        }
      val t = math.min(once(), once())
      println(f"$q%-26s $t%8.2f s   (first sample $discarded%.2f s, discarded)")
      q -> t
    }
    println(f"TOTAL ${results.map(_._2).sum}%.2f s over $nDocs docs")
    spark.stop()
  }
}
