package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import graft.QueryHarness.spark

/** Property-based parity for the round-7 native kernels: handpicked
  * edges pin what the author thought of; a few hundred adversarial
  * random inputs pin what they didn't. Each property batches its
  * samples into ONE DataFrame compare (a per-sample Spark job would
  * take minutes), and failures surface the offending input.
  */
class KernelPropertySpec extends AnyFunSuite {
  import spark.implicits._

  // strings biased toward the nasty corners: ASCII whitespace runs,
  // unicode spaces (NBSP, ideographic), combining marks, sigma-final
  // contexts, emoji (surrogate pairs in JVM strings), and plain words
  private val charGen: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumStr.map(_.take(4)),
    3 -> Gen.oneOf(" ", "\t", "\n", "\r", "\f", ""),
    1 -> Gen.oneOf(" ", "　", " "), // NOT Java \s
    1 -> Gen.oneOf("Σ", "σ", "ς", "İ", "ß", "Ω"),
    1 -> Gen.oneOf("日本", "中文", "한국", "é", "ü"),
    1 -> Gen.oneOf("😀", "🎲", "🜚"),
    1 -> Gen.const(""))
  private val textGen: Gen[String] =
    Gen.listOfN(12, charGen).map(_.mkString)

  private def samples(n: Int, g: Gen[String]): Seq[String] = {
    val seed = org.scalacheck.rng.Seed(42L)
    Iterator.iterate((g.pureApply(Gen.Parameters.default, seed), seed)) {
      case (_, s) =>
        val next = s.next
        (g.pureApply(Gen.Parameters.default, next), next)
    }.map(_._1).take(n).toSeq
  }

  test("WsTokens == filter(split(lower)) on 400 adversarial strings") {
    val df = samples(400, textGen).toDF("text")
    val bad = df
      .withColumn("a",
        expr("filter(split(lower(text), '\\\\s+'), x -> x <> '')"))
      .withColumn("b", WsTokens(col("text")))
      .withColumn("ar",
        expr("filter(split(text, '\\\\s+'), x -> x <> '')"))
      .withColumn("br", WsTokens(col("text"), lowered = false))
      .where(col("a") =!= col("b") || col("ar") =!= col("br"))
      .select("text", "a", "b", "ar", "br")
      .collect()
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString("; ")}")
  }

  test("SortedIntersectCount == size(array_intersect) on random sorted sets") {
    val arrGen = Gen.listOf(Gen.chooseNum(0L, 40L))
      .map(_.distinct.sorted)
    val seed = org.scalacheck.rng.Seed(7L)
    val pairs = Iterator.iterate(
      ((arrGen.pureApply(Gen.Parameters.default, seed),
        arrGen.pureApply(Gen.Parameters.default, seed.next)), seed)) {
      case (_, s) =>
        val n1 = s.next; val n2 = n1.next
        ((arrGen.pureApply(Gen.Parameters.default, n1),
          arrGen.pureApply(Gen.Parameters.default, n2)), n2)
    }.map(_._1).take(300).toSeq
    val df = pairs.toDF("a", "b")
    val bad = df
      .withColumn("builtin", expr("size(array_intersect(a, b))"))
      .withColumn("native", SortedIntersectCount(col("a"), col("b")))
      .where(col("builtin") =!= col("native"))
      .collect()
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString("; ")}")
  }
}
