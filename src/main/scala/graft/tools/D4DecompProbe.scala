package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decomposes d4's pair stage cost at a given SF:
  * `D4DecompProbe <corpusDir> [reps]` times each prefix of the plan
  * (scan+kernel, +explode, +join, +agg, full d4) so the expensive
  * slice is attributable before any reshape is attempted.
  */
object D4DecompProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
    val narrow = docs.groupBy("source")
      .agg(count(lit(1)).as("w"))
      .where(col("w") <= 1000)
      .select("source")
    val capped = docs.join(broadcast(narrow), "source")
      .select(col("doc_id"), col("source"),
        graft.functions.ShingleHashes(col("text")).as("hs"))
    def sh = capped
      .select(col("doc_id"), col("source"), size(col("hs")).as("n"),
        explode(col("hs")).as("h"))
    def joined = sh.as("a").hint("shuffle_hash")
      .join(sh.as("b").hint("shuffle_hash"),
        col("a.source") === col("b.source") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
    def paired = joined
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("shared"))

    println("sh rows=" + sh.count() + " join rows=" + joined.count() +
      " pair rows=" + paired.count())

    val stages = Seq[(String, () => DataFrame)](
      "kernel (capped+hs)" -> (() => capped),
      "explode (sh)" -> (() => sh),
      "self-join" -> (() => joined),
      "join+agg" -> (() => paired),
      "full d4" -> (() =>
        graft.SparkEntry.queries("d4_ngram_jaccard")(spark, d)))

    (1 to reps).foreach { i =>
      stages.foreach { case (nm, f) =>
        val t0 = System.nanoTime()
        force(f())
        println(f"$nm%-20s rep$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}
