package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Measures the n9 PQ-encode projection: forces the query twice
  * (run 1 includes codebook training/registry lookup; run 2 is the
  * steady-state encode), then counts WholeStageCodegen spans in the
  * FINAL adaptive plan — the pre-execution count is an AQE artifact.
  */
object N9Probe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(tag: String): Unit = {
      val df = graft.SparkEntry.queries("n9_pq_encode")(spark, d)
      val t0 = System.nanoTime()
      graft.Bench.force(df)
      println(f"$tag force: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      val finalPlan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val wsc = finalPlan.collect { case w: WholeStageCodegenExec => w }
      println(s"$tag final-plan WholeStageCodegen spans: ${wsc.size}")
      println(finalPlan.toString.linesIterator
        .map(l => if (l.length > 160) l.take(160) + "…" else l)
        .take(14).mkString("\n"))
    }
    once("run1")
    once("run2")
    spark.stop()
  }
}
