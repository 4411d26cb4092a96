package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cost breakdown of m8_crossmodal_rerank at probe
  * scale: `M8Probe <corpusDir>`. Times (1) the text-probe encoding,
  * (2) the ADC scored pass, (3) the top-C shortlist aggregate, (4)
  * the full catalog query — isolating where the seconds go.
  */
object M8Probe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // JIT warm on the n16 shape first so stage times are steady-state
    t("n16 (jit warm)") {
      graft.Bench.force(graft.SparkEntry.queries("n16_batch_adc")(spark, d))
    }

    import graft.llm.{MultimodalQueries, SimilarityQueries}
    // the catalog's shared encoder (checkpointed) — the UNBARRIERED
    // form (qnorm filter inline over the raw encoder expression)
    // measured 47.8-86.7 s here: CombineFilters merges the
    // interpreted-encoder conjunct into the budget filter and every
    // row-group-admitted row pays it
    // the encoder's localCheckpoint materializes EAGERLY at
    // construction — time the construction call itself, not just the
    // checkpoint re-read
    val probes = t("probe encode (construct+ckpt)") {
      MultimodalQueries.encodedTextProbes(spark, d)
        .withColumn("qnorm",
          sqrt(graft.functions.DotProduct(col("qe"), col("qe"))))
        .where(col("qnorm") > 0)
    }
    t("probe encode (force)") { graft.Bench.force(probes) }

    val scored = SimilarityQueries.batchAdcScoredFor(spark, d,
      probes.select(col("probe_id"), col("qe")), excludeVecProbes = false)
    t("adc scored (count)") { println("  rows: " + scored.count()) }

    val shortlist = scored
      .groupBy("probe_id")
      .agg(graft.functions.NativeTopK
        .topNeighbors(50, lit(0.0) - col("ad2"), col("vec_id")).as("top"))
      .select(col("probe_id"), explode(col("top.id")).as("vec_id"))
    t("shortlist (count)") { println("  rows: " + shortlist.count()) }

    t("full m8") {
      graft.Bench.force(
        graft.SparkEntry.queries("m8_crossmodal_rerank")(spark, d))
    }
    t("full m8 again") {
      graft.Bench.force(
        graft.SparkEntry.queries("m8_crossmodal_rerank")(spark, d))
    }
    spark.stop()
  }
}
