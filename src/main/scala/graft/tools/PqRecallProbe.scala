package graft.tools

import org.apache.spark.sql.SparkSession

/** n14 recall vs nprobe on BOTH corpus shapes:
  * `PqRecallProbe <nVecs> <workDir>`.
  *
  * The round-6 verdict flagged that n14's recorded recall numbers
  * (raw 0.1–0.2, re-ranked 0.3–0.7) come from the DIFFUSE synthetic
  * embeddings — i.i.d. uniform components, so inter-point angles
  * concentrate near 90° and the coarse quantizer has no structure to
  * exploit; nobody should quote those numbers for a real corpus.
  * Real embedding corpora are CLUSTERED (that is what makes IVF work
  * at all), so this probe generates a mixture-of-gaussians corpus —
  * K=16 hash-derived unit centers, sigma=0.25 relative noise, the
  * probe vector a member of cluster 0 — alongside the diffuse shape,
  * and records n14's (recall_pq, recall_rerank) as nprobe sweeps
  * 1,2,4,8,16 on each. Deterministic like every probe generator
  * (splittable per-id LCG — any parallelism, same corpus).
  */
object PqRecallProbe {

  private def writeCorpus(spark: SparkSession, nVecs: Long,
      dir: String, clustered: Boolean): Unit =
    ProbeCorpora.write(spark, nVecs, dir, clustered)

  def main(args: Array[String]): Unit = {
    val nVecs = args(0).toLong
    val workDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the three serving dials swept together: corpus shape × code
    // budget (graft.pq.k: 8 = oracle default = 12-bit codes; 64 =
    // 24-bit, the production direction — FAISS ships 8-bit × M) ×
    // nprobe; plus a rerank_c row at the hardest point
    Seq(("diffuse", false), ("clustered", true)).foreach {
      case (shape, clustered) =>
        val dir = s"$workDir/$shape"
        writeCorpus(spark, nVecs, dir, clustered)
        Seq(8, 64).foreach { k =>
          spark.conf.set("graft.pq.k", k.toString)
          println(s"== $shape corpus ($nVecs vecs), pq.k=$k " +
            s"(${(math.log(k) / math.log(2)).round * 4} code bits) ==")
          println(f"${"nprobe"}%-8s ${"recall_pq@10"}%-14s ${"recall_rerank@10"}%-16s ${"sec"}%-6s")
          Seq(1, 2, 4, 8).foreach { np =>
            spark.conf.set("graft.ann.nprobe", np.toString)
            val t0 = System.nanoTime()
            val r = graft.SparkEntry
              .queries("n14_pq_rerank_recall")(spark, dir).head
            val dt = (System.nanoTime() - t0) / 1e9
            println(f"$np%-8d ${r.getAs[Double]("recall_pq_at_10")}%-14.2f " +
              f"${r.getAs[Double]("recall_rerank_at_10")}%-16.2f $dt%-6.1f")
          }
          // widen the shortlist at full probe: does re-rank recover
          // what the code budget cannot rank?
          Seq(200, 1000).foreach { c =>
            spark.conf.set("graft.ann.rerank_c", c.toString)
            val r = graft.SparkEntry
              .queries("n14_pq_rerank_recall")(spark, dir).head
            println(f"nprobe=8 rerank_c=$c%-6d -> recall_rerank " +
              f"${r.getAs[Double]("recall_rerank_at_10")}%.2f")
            spark.conf.unset("graft.ann.rerank_c")
          }
          spark.conf.unset("graft.ann.nprobe")
        }
        spark.conf.unset("graft.pq.k")
    }
    spark.stop()
  }
}
