package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the dedup hotspots (dev tool). */
object ProfileD3 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.DedupQueries

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      time("docs scan")(graft.Tables.documents(spark, d).count())
      val withHs = graft.Tables.documents(spark, d)
        .withColumn("hs", expr(
          """array_distinct(transform(
            |  sequence(0, greatest(length(text) - 8, 0)),
            |  i -> CAST(conv(substr(md5(substring(text, i + 1, 8)), 1, 7), 16, 10) AS BIGINT)))""".stripMargin))
      time("shingle hashes")(withHs.select(sum(size(col("hs")))).collect())
      val sigs = withHs
        .withColumn("sig", graft.functions.MinhashSignature(col("hs"), 16))
        .select(col("doc_id"), col("sig"))
      time("sigs")(sigs.select(sum(element_at(col("sig"), 1))).collect())
      time("full d3")(DedupQueries.queries("d3_minhash_lsh_pairs")(spark, d).count())
      time("full d2")(DedupQueries.queries("d2_minhash_signatures")(spark, d).count())
    }
    spark.stop()
  }
}
