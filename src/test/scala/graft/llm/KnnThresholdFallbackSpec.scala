package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryHarness.spark

/** n5's sampled-threshold pruning must be EXACT — and in particular
  * must degrade to keep-all when the deterministic corpus sample is
  * empty. A corpus with no vec_id divisible by 401 (any corpus under
  * ~402 vectors, or an id space that skips the stride) produces an
  * empty threshold relation; the old inner join then dropped every
  * probe and returned ZERO rows instead of the exact top-5. The left
  * join + keep-all fallback keeps the pruning a pure optimization.
  */
class KnnThresholdFallbackSpec extends AnyFunSuite {
  import spark.implicits._

  test("n5 returns exact top-5 when the threshold sample is empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft_n5").toString
    // 60 vectors, ids 1..60 plus probe 0: no id % 401 == 0 except the
    // probe itself (excluded from the corpus) -> empty thr relation
    val rng = new scala.util.Random(7)
    (0 to 60).map { i =>
      (i.toLong, i % 3, Array.fill(64)(rng.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = SimilarityQueries.queries("n5_knn_join")(spark, dir)
      .collect()
    assert(got.nonEmpty, "empty thr sample must not drop every probe")

    // exact reference: the window formulation over the same data
    val t = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(graft.functions.DotProduct(col("e"), col("e"))))
    val probes = t.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("e").as("qe"),
        col("norm").as("qnorm"))
    val scored = t.where(!(col("vec_id") % 50 === 0))
      .crossJoin(probes)
      .select(col("probe_id"), col("vec_id"),
        round(graft.functions.DotProduct(col("e"), col("qe")) /
          (col("norm") * col("qnorm")), 6).as("cos"))
    val expected = scored
      .withColumn("rk", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rk") <= 5)
      .select(col("probe_id"), col("rk").cast("int"),
        col("vec_id"), col("cos"))
      .orderBy("probe_id", "rk")
      .collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq ===
      expected.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq)
  }
}
