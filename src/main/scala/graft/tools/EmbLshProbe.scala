package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe d9's parametrized miner at scale:
  * `EmbLshProbe <dir> <planes> <tables> <cap> [reps]` times
  * [[graft.llm.SimilarityQueries.embeddingLshPairs]] and reports the
  * mined pair count — the evidence that the planes dial (bucket width
  * ~ n/2^planes) is how the plan absorbs corpus growth while the cap
  * bounds worst-case density.
  */
object EmbLshProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, planes, tables, cap) = args.take(4)
    val reps = if (args.length > 4) args(4).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (0 until reps).foreach { _ =>
      val t0 = System.nanoTime()
      val df = graft.llm.SimilarityQueries.embeddingLshPairs(
        spark, dir, planes.toInt, tables.toInt, cap.toLong)
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"planes=$planes tables=$tables cap=$cap pairs=$n ${secs}%.1f s")
    }
    spark.stop()
  }
}
