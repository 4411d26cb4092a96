package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.{spark, sf0001}

/** PQ (n9/n10): the oracle pins codes, reconstruction errors and ADC
  * distances bit-for-bit; these specs pin the structural claims the
  * oracle can't see — codebook shape, the map-only (join-free) encode
  * plan, and the ADC result's basic geometry.
  */
class PqSpec extends AnyFunSuite {
  import spark.implicits._

  test("codebooks: M books of K centroids, each SubDim wide") {
    val cb = PQ.fit(spark, sf0001)
    assert(cb.books.size == PQ.M)
    cb.books.foreach { m =>
      assert(m.centroids.size == PQ.K)
      assert(m.centroids.map(_._1) == (0L until PQ.K.toLong))
      m.centroids.foreach { case (_, c) => assert(c.length == PQ.SubDim) }
    }
  }

  test("n9 emits M scalar codes in [0, K) per vector") {
    val out = graft.SparkEntry.queries("n9_pq_encode")(spark, sf0001)
      .localCheckpoint()
    // scalar BIGINT code columns (not ARRAY) — the serving/storage
    // shape, and the shape the oracle comparator can hash-sort
    val codeCols = (0 until PQ.M).map(j => s"code$j")
    assert(codeCols.forall(out.columns.contains))
    codeCols.foreach { c =>
      assert(out.where(col(c) < 0 || col(c) >= PQ.K).isEmpty)
    }
    // quantization error is a sum of squared distances: never negative
    assert(out.where(col("err") < 0).isEmpty)
  }

  test("n9 encode plan is join-free (a map-only pass over the corpus)") {
    val plan = graft.SparkEntry.queries("n9_pq_encode")(spark, sf0001)
      .queryExecution.executedPlan
    val joins = plan.collect {
      case j if j.nodeName.contains("Join") => j.nodeName
    }
    assert(joins.isEmpty, s"encode should not join: $joins")
  }

  test("n14 re-rank never loses recall vs raw PQ top-10") {
    val row = graft.SparkEntry.queries("n14_pq_rerank_recall")(
      spark, sf0001).head
    val (hitsPq, hitsRr) = (row.getLong(0), row.getLong(2))
    assert(hitsPq >= 0 && hitsPq <= 10 && hitsRr >= 0 && hitsRr <= 10)
    // the exact re-rank re-orders the ADC top-C by the true metric:
    // it can only recover true neighbors the codes mis-ranked, never
    // drop ones the codes already placed in the top-10... unless a
    // true neighbor sat in ADC positions 11..C, which is the lift.
    assert(hitsRr >= hitsPq,
      s"re-rank lost recall: pq=$hitsPq rerank=$hitsRr")
  }

  test("n10 ADC top-10 excludes the probe and is sorted nonnegative") {
    val rows = graft.SparkEntry.queries("n10_pq_adc")(spark, sf0001)
      .as[(Long, Double)].collect()
    assert(rows.length == 10)
    assert(rows.forall(_._1 != 0L))
    assert(rows.forall(_._2 >= 0.0))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
  }
}
