package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.{spark, sf0001}

/** d12 semantics: the distributed plan (trained-model assignment →
  * broadcast size gate → within-cluster pair join) must reproduce the
  * obvious driver-side brute force, and the hot-cluster cap must
  * starve (keep everything) rather than dedup partially.
  */
class SemanticDedupSpec extends AnyFunSuite {

  private def cos6(a: Array[Double], b: Array[Double]): Double = {
    def fold(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }
      s
    }
    BigDecimal(fold(a, b) / (math.sqrt(fold(a, a)) * math.sqrt(fold(b, b))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private lazy val assigned: Seq[(Long, Long, Array[Double])] = {
    val model = KMeans.fit(spark, sf0001)
    graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("ee", graft.functions.DotProduct(col("e"), col("e")))
      .withColumn("cid", KMeans.assignCol(model.centroids).getField("cid"))
      .select("vec_id", "cid", "e").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
      .toSeq
  }

  test("d12 removes exactly the vectors with a smaller-id same-cluster " +
      "neighbor at cos >= 0.4") {
    val expectRemoved = assigned.flatMap { case (id, cid, e) =>
      val hasDup = assigned.exists { case (id2, cid2, e2) =>
        cid2 == cid && id2 < id && cos6(e, e2) >= 0.4
      }
      if (hasDup) Some(id) else None
    }.toSet
    assert(expectRemoved.nonEmpty, "testdata has no semantic dups — " +
      "the equivalence test would be vacuous")
    val got = graft.SparkEntry.queries("d12_semantic_dedup")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got.size == assigned.size)
    assert(got.filter(_._2).keySet == expectRemoved)
  }

  test("a cluster wider than the cap starves: everything kept") {
    val got = SimilarityQueries.semanticDedup(spark, sf0001, cap = 1L)
      .collect()
    assert(got.nonEmpty && got.forall(!_.getBoolean(2)),
      "cap=1 must keep every vector (no cluster is eligible)")
  }
}
