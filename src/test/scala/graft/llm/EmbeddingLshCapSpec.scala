package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Pins that d9's hyperplane-bucket cap binds: a dense cluster wider
  * than the cap contributes no pairs (its quadratic in-bucket
  * self-join never runs) while an isolated near-identical pair in a
  * narrow bucket still surfaces. This is the guard the 400k-vector
  * probe demanded — without it, a corpus whose density outgrows the
  * plane count turns candidate mining into billions of wide-array
  * dot products.
  */
class EmbeddingLshCapSpec extends AnyFunSuite {
  import graft.QueryHarness._

  private def corpus(dir: String): Unit = {
    import spark.implicits._
    // dense cluster: 60 copies of one direction (same buckets in
    // every table, all cos = 1); isolated pair: a different direction
    // only 2 vectors share
    val dense = (0L until 60L).map { i =>
      (i, Array.fill(64)(0.5f), 0)
    }
    val pair = Seq(
      (100L, (0 until 64).map(j => if (j % 2 == 0) 0.9f else -0.4f).toArray, 1),
      (101L, (0 until 64).map(j => if (j % 2 == 0) 0.9f else -0.4f).toArray, 1))
    (dense ++ pair).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("bucket cap drops the dense cluster, keeps the isolated pair") {
    val dir = java.nio.file.Files.createTempDirectory("graft_embcap")
      .toString
    corpus(dir)
    val capped = SimilarityQueries
      .embeddingLshPairs(spark, dir, planes = 6, tables = 4, cap = 10)
      .collect()
    assert(capped.nonEmpty, "isolated near-dup pair must survive")
    assert(capped.forall(r => r.getLong(0) >= 100L && r.getLong(1) >= 100L),
      s"dense-cluster pairs leaked through the cap: ${capped.take(5).mkString(", ")}")
    // control: without the cap the dense cluster floods the result
    val uncapped = SimilarityQueries
      .embeddingLshPairs(spark, dir, planes = 6, tables = 4, cap = 1000000)
      .collect()
    assert(uncapped.count(r => r.getLong(0) < 60L) > 100,
      "control: dense cluster must produce pairs when the cap does not bind")
  }

  test("more planes split a dense bucket below the cap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_embplanes")
      .toString
    import spark.implicits._
    // 40 vectors in 4 similar-but-distinct directions (10 each):
    // at 2 planes they pile into few buckets; at 12 planes the
    // buckets thin out and pairs mine under the same cap
    val vecs = (0L until 40L).map { i =>
      val g = (i % 4).toInt
      (i, (0 until 64).map { j =>
        (math.sin(j * (g + 1) * 0.37) + (if (j == i % 64) 0.05 else 0.0))
          .toFloat
      }.toArray, g)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val coarse = SimilarityQueries
      .embeddingLshPairs(spark, dir, planes = 2, tables = 2, cap = 12)
    val fine = SimilarityQueries
      .embeddingLshPairs(spark, dir, planes = 12, tables = 2, cap = 12)
    // coarse: 4 groups of 10 share 4-bucket space -> buckets exceed
    // the cap and mining starves; fine: same corpus mines pairs
    assert(fine.count() > coarse.count(),
      "growing planes must recover mining under a fixed cap")
    assert(fine.count() > 0)
  }
}
