package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark
import graft.llm.KMeans

/** Pins the native [[CentroidScanBase]] kernel bit-for-bit to the
  * composed-builtins twin (`least` + first-match CASE,
  * `KMeans.assignColOnBuiltins`) — the contract that keeps the DuckDB
  * oracles for n2/n6/n7/n9/n10/n12/n14/d12 green after the swap.
  * Covers the ugly corners explicitly: null vectors, mis-sized
  * vectors, NaN components, exact duplicate centroids (tie → smaller
  * cid), and ±0.0 distance collisions.
  */
class CentroidArgminSpec extends AnyFunSuite {

  private val dim = 4

  private def cents(seed: Int): Seq[(Long, Array[Double])] =
    (0L until 6L).map { i =>
      i -> Array.tabulate(dim)(j =>
        math.sin(seed + i * 7.0 + j * 3.0) * 2.0)
    }

  /** Rows: deterministic pseudo-random vectors + adversarial edges. */
  private def corpus(): org.apache.spark.sql.DataFrame = {
    val rng = new scala.util.Random(42)
    val normal = (0 until 500).map { i =>
      Row(i.toLong, (0 until dim).map(_ => rng.nextGaussian()).toSeq)
    }
    val edges = Seq(
      Row(9001L, null), // null vector
      Row(9002L, Seq(1.0, 2.0)), // wrong length
      Row(9003L, Seq(Double.NaN, 1.0, 2.0, 3.0)), // NaN component
      Row(9004L, Seq(0.0, 0.0, 0.0, 0.0)), // zero vector
      Row(9005L, (0 until dim).map(_ => Double.NaN).toSeq)) // all NaN
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("e", ArrayType(DoubleType), nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(normal ++ edges, 4), schema)
  }

  private def compare(cs: Seq[(Long, Array[Double])]): Unit = {
    val base = corpus()
      .withColumn("ee", DotProduct(col("e"), col("e")))
    val both = base
      .withColumn("nat", KMeans.assignColOn(cs, col("e"), col("ee")))
      .withColumn("twin", KMeans.assignColOnBuiltins(cs, col("e"), col("ee")))
      .select(col("vec_id"),
        col("nat.cid").as("ncid"), col("twin.cid").as("tcid"),
        col("nat.d2").as("nd2"), col("twin.d2").as("td2"))
      .collect()
    assert(both.length == 505)
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"cid mismatch at vec_id=${r.getLong(0)}: $r")
      val nNull = r.isNullAt(3)
      val tNull = r.isNullAt(4)
      assert(nNull == tNull, s"d2 nullness at vec_id=${r.getLong(0)}: $r")
      if (!nNull) {
        // bit-for-bit, not approximate (NaN == NaN here by raw bits)
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(3)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(4)),
          s"d2 bits at vec_id=${r.getLong(0)}: $r")
      }
    }
  }

  test("native kernel == builtins twin on random vectors + edges") {
    compare(cents(1))
  }

  test("duplicate centroids tie to the smaller cid in both") {
    val c = cents(2)
    // cid 4 duplicates cid 1's coordinates exactly: every row whose
    // argmin is one of them must resolve to 1 in BOTH formulations
    val dup = c.map { case (i, a) =>
      if (i == 4L) (4L, c(1)._2.clone()) else (i, a)
    }
    compare(dup)
    val base = corpus().where(col("e").isNotNull)
      .withColumn("ee", DotProduct(col("e"), col("e")))
      .withColumn("cid",
        KMeans.assignColOn(dup, col("e"), col("ee")).getField("cid"))
    assert(base.where(col("cid") === 4L).count() == 0)
  }

  test("null and mis-sized vectors yield (null d2, cid -1)") {
    val base = corpus()
      .withColumn("ee", DotProduct(col("e"), col("e")))
      .withColumn("m", KMeans.assignColOn(cents(3), col("e"), col("ee")))
      .where(col("vec_id").isin(9001L, 9002L, 9005L))
      .select(col("vec_id"), col("m.d2"), col("m.cid"))
      .collect()
    assert(base.length == 3)
    base.foreach { r =>
      val vid = r.getLong(0)
      if (vid == 9005L) {
        // all-NaN vector: every d2 is NaN, `least` returns NaN, and
        // Spark's `===` treats NaN = NaN as TRUE -> the FIRST CASE
        // arm matches -> smallest cid (0), d2 NaN non-null
        assert(!r.isNullAt(1) && r.getDouble(1).isNaN && r.getLong(2) == 0L, s"$r")
      } else {
        assert(r.isNullAt(1) && r.getLong(2) == -1L, s"$r")
      }
    }
  }

  test("single-centroid codebook (the k=1 least-elision branch)") {
    compare(cents(4).take(1))
  }

  test("interpreted eval matches codegen (same rows, forced fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      compare(cents(5))
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.wholeStage", v)
        case None => spark.conf.unset("spark.sql.codegen.wholeStage")
      }
    }
  }
}
