package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** d16 cost anatomy: `D16Probe <corpusDir>` prints the probe-side
  * band-pair population, how many the exact counting bounds (length
  * band, char-histogram L1, trigram deficit) each prune, and the doc
  * length distribution — the data for choosing the cheapest exact
  * pre-DP filter whose survivors ≈ the true dup set.
  */
object D16Probe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tri = expr(
      """sort_array(transform(sequence(0, greatest(length(text) - 3, -1)),
        |  i -> xxhash64(substring(text, i + 1, 3))))""".stripMargin)
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), length(col("text")).as("n"),
        graft.functions.CharHist(col("text")).as("ch"), tri.as("tg"))
      .withColumn("bk", floor(log(1.25,
        greatest(col("n"), lit(1)).cast("double"))).cast("int"))
    val budget = graft.llm.DedupQueries.D16ProbeBudget
    val isProbe = col("doc_id") % 5 === 0 && col("doc_id") < budget
    println(docs.agg(count(lit(1)), min("n"), expr("percentile(n, 0.5)"),
      expr("percentile(n, 0.9)"), max("n")).head().toString)
    val probes = docs.where(isProbe)
      .select(col("doc_id").as("pid"), col("n").as("pn"),
        col("ch").as("pch"), col("tg").as("ptg"),
        explode(array(col("bk") - 1, col("bk"), col("bk") + 1)).as("pbk"))
    val joined = docs.join(broadcast(probes),
        col("bk") === col("pbk") && col("doc_id") =!= col("pid"))
      .select(col("n"), col("pn"),
        greatest(col("n"), col("pn")).as("m"),
        (abs(col("n") - col("pn")) * 5 <=
          greatest(col("n"), col("pn"))).as("band_ok"),
        (graft.functions.IntArrayL1(col("ch"), col("pch")) * 5 <=
          lit(2) * greatest(col("n"), col("pn"))).as("l1_ok"),
        (graft.functions.SortedIntersectCount(col("tg"), col("ptg")) * 5 >=
          lit(2) * greatest(col("n"), col("pn")) - 10).as("tri_ok"))
    val r = joined.agg(count(lit(1)).as("bucket_pairs"),
      sum(when(col("band_ok"), 1L).otherwise(0L)).as("band_pairs"),
      sum(when(col("band_ok") && col("l1_ok"), 1L).otherwise(0L))
        .as("l1_survivors"),
      sum(when(col("band_ok") && col("tri_ok"), 1L).otherwise(0L))
        .as("tri_survivors"),
      avg(when(col("band_ok"), col("m"))).as("avg_m")).head()
    println(s"bucket_pairs=${r.getLong(0)} band_pairs=${r.getLong(1)} " +
      s"l1_survivors=${r.getLong(2)} tri_survivors=${r.getLong(3)} " +
      f"avg_m=${r.getDouble(4)}%.0f")
    spark.stop()
  }
}
