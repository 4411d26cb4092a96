package graft.tools
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Temporary bisect: time the n9 encode shapes at full probe scale. */
object CgBisect {
  def time(tag: String, df: DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(args(0) + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    def fakeCents(seed: Int) =
      (0L until 8L).map(i => (i, Array.tabulate(16)(k => 0.01 * (i + k + seed))))
    val withSlices = (0 until 4).foldLeft(base)((df, j) =>
      df.withColumn(s"__e$j", slice(col("e"), j * 16 + 1, 16)))
    val withEe = (0 until 4).foldLeft(withSlices)((df, j) =>
      df.withColumn(s"__ee$j",
        graft.functions.DotProduct(col(s"__e$j"), col(s"__e$j"))))
    val withM = (0 until 4).foldLeft(withEe)((df, j) =>
      df.withColumn(s"m$j", graft.llm.KMeans.assignColOn(
        fakeCents(j), col(s"__e$j"), col(s"__ee$j"))))
    val withErr = withM.select(
      (col("vec_id") +: (0 until 4).map(j => col(s"m$j.cid").as(s"code$j"))) :+
        round((0 until 4).map(j => col(s"m$j.d2")).reduce(_ + _), 6).as("err"): _*)
    time("warmup(no-sort)", withErr)
    time("no-sort", withErr)
    time("with-sort", withErr.orderBy("vec_id"))
    time("structs-no-extract", withM)
    spark.stop()
  }
}
