package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark

/** Pins the native [[LevenshteinWithin]] kernel to the builtin 3-arg
  * `levenshtein` contract — distance when ≤ thr, −1 otherwise — on
  * randomized ASCII and multibyte strings plus the edge combinations
  * (empty strings, thr 0, thr ≥ max length, equal strings, nulls).
  * This parity is what licenses d14 to use the banded kernel while the
  * DuckDB oracle replays the plain 2-arg levenshtein + threshold
  * filter.
  */
class BandedLevenshteinSpec extends AnyFunSuite {

  private def pairsDf(rows: Seq[Row]) = {
    val schema = StructType(Seq(
      StructField("a", StringType, nullable = true),
      StructField("b", StringType, nullable = true),
      StructField("thr", IntegerType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
  }

  private def assertParity(rows: Seq[Row]): Unit = {
    val df = pairsDf(rows)
      .withColumn("builtin", expr("levenshtein(a, b, thr)"))
      .withColumn("native",
        BandedLevenshtein(col("a"), col("b"), col("thr")))
    val bad = df.filter(
      !(col("builtin") <=> col("native"))).collect()
    assert(bad.isEmpty, s"parity breaks: ${bad.take(5).mkString("; ")}")
  }

  test("randomized ASCII parity (2000 pairs, mixed thresholds)") {
    val rng = new scala.util.Random(1234)
    def word(n: Int) =
      (0 until n).map(_ => ('a' + rng.nextInt(6)).toChar).mkString
    val rows = (0 until 2000).map { _ =>
      val a = word(rng.nextInt(40))
      // half the pairs are edits of a, half independent
      val b =
        if (rng.nextBoolean()) {
          val sb = new StringBuilder(a)
          (0 until rng.nextInt(6)).foreach { _ =>
            if (sb.nonEmpty) {
              val p = rng.nextInt(sb.length)
              rng.nextInt(3) match {
                case 0 => sb.deleteCharAt(p)
                case 1 => sb.insert(p, ('a' + rng.nextInt(6)).toChar)
                case _ => sb.setCharAt(p, ('a' + rng.nextInt(6)).toChar)
              }
            }
          }
          sb.toString
        } else word(rng.nextInt(40))
      Row(a, b, rng.nextInt(12))
    }
    assertParity(rows)
  }

  test("multibyte parity (code points, not bytes)") {
    val rows = Seq(
      Row("héllo", "hello", 3),
      Row("héllo", "hello", 0),
      Row("日本語のテキスト", "日本語テキスト", 2),
      Row("日本語のテキスト", "日本語テキスト", 1),
      Row("αβγδε", "αβγε", 5),
      Row("😀😀😀", "😀😀", 2),
      Row("naïve", "naive", 10))
    assertParity(rows)
  }

  test("edges: empty, equal, thr 0, thr huge, negative thr") {
    val rows = Seq(
      Row("", "", 0), Row("", "", 5),
      Row("", "abc", 2), Row("", "abc", 3),
      Row("same", "same", 0),
      Row("kitten", "sitting", 3), Row("kitten", "sitting", 2),
      Row("kitten", "sitting", 100),
      Row("abcdef", "ghijkl", 0),
      Row("ab", "ba", 2))
    assertParity(rows)
    // negative thr: the builtin rejects it at runtime in some
    // versions; pin OUR contract directly instead
    assert(BandedLevenshtein.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("x"),
      org.apache.spark.unsafe.types.UTF8String.fromString("x"), -1) == -1)
  }

  test("null propagation") {
    val df = pairsDf(Seq(Row(null, "x", 1), Row("x", null, 1),
      Row("x", "x", null)))
      .withColumn("native",
        BandedLevenshtein(col("a"), col("b"), col("thr")))
    assert(df.select("native").collect().forall(_.isNullAt(0)))
  }

  test("interpreted eval matches codegen") {
    // force the interpreted path through a direct expression eval
    val e = LevenshteinWithin(
      org.apache.spark.sql.catalyst.expressions.Literal("kitten"),
      org.apache.spark.sql.catalyst.expressions.Literal("sitting"),
      org.apache.spark.sql.catalyst.expressions.Literal(3))
    assert(e.eval(null) == 3)
    val miss = LevenshteinWithin(
      org.apache.spark.sql.catalyst.expressions.Literal("kitten"),
      org.apache.spark.sql.catalyst.expressions.Literal("sitting"),
      org.apache.spark.sql.catalyst.expressions.Literal(2))
    assert(miss.eval(null) == -1)
  }

  test("SQL registration: levenshtein_within callable from SQL") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT levenshtein_within('kitten', 'sitting', 3) AS d").collect()
    assert(r.head.getInt(0) == 3)
  }
}
