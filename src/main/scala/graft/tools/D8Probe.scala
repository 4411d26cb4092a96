package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage cost breakdown of d8_jaccard_verify at probe scale:
  * `D8Probe <corpusDir>`. Times (1) the d7 candidate evaluation into
  * the localCheckpoint, (2) candidate-doc shingle hashing, (3) the
  * two pair joins + intersection without the final sort, (4) the
  * full catalog query — isolating where the 4M-probe seconds go.
  */
object D8Probe {
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
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val cands = t("d7 -> localCheckpoint") {
      graft.SparkEntry.queries("d7_lsh_bucket_cap")(spark, d)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
    }
    println(s"  candidate pairs: ${cands.count()}")

    val candDocs = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b").as("doc_id"))).distinct()
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val hs = docs
      .select(col("doc_id"), sort_array(graft.functions.ShingleHashes(col("text"))).as("hs"))
      .join(candDocs.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
    t("shingles for candidate docs") {
      graft.Bench.force(hs.select(col("doc_id")))
    }

    val fan = spark.sparkContext.defaultParallelism
    def joined: DataFrame = cands.hint("shuffle_hash")
      .join(hs.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
        .hint("shuffle_hash"), "doc_a")
      .join(hs.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
        .hint("shuffle_hash"), "doc_b")
    def scored: DataFrame = joined
      .repartition(fan, col("doc_a"), col("doc_b"))
      .withColumn("shared", graft.functions.SortedIntersectCount(col("hs_a"), col("hs_b")))
      .withColumn("jaccard", round(
        col("shared") / (size(col("hs_a")) + size(col("hs_b")) - col("shared")), 4))
      .select("doc_a", "doc_b", "jaccard")
    t("joins+intersect (no sort)") { graft.Bench.force(scored) }
    t("joins+intersect no fanout") {
      graft.Bench.force(joined
        .withColumn("shared", graft.functions.SortedIntersectCount(col("hs_a"), col("hs_b")))
        .withColumn("jaccard", round(
          col("shared") / (size(col("hs_a")) + size(col("hs_b")) - col("shared")), 4))
        .select("doc_a", "doc_b", "jaccard"))
    }
    t("+ orderBy (full tail)") { graft.Bench.force(scored.orderBy("doc_a", "doc_b")) }
    t("full catalog d8") {
      graft.Bench.force(graft.SparkEntry.queries("d8_jaccard_verify")(spark, d))
    }
    spark.stop()
  }
}
