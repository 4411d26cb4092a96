package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import graft.QueryHarness.spark

/** Soundness of d16's counting lower bound (round-10 verdict item 1):
  * ceil(L1(charHist(a), charHist(b)) / 2) ≤ lev(a, b) on random pairs
  * — including multibyte text, where the histogram must bin CODE
  * POINTS (lev's edit units), not UTF-8 bytes. An unsound bound would
  * silently shrink d16's exact truth set; the DuckDB oracle (which
  * mines truth with no bound at all) is the end-to-end check, this
  * spec the direct one.
  */
class CharHistBoundSpec extends AnyFunSuite {
  import spark.implicits._

  private val charGen: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumStr.map(_.take(4)),
    2 -> Gen.oneOf(" ", "\t", "\n", ""),
    1 -> Gen.oneOf("Σ", "ß", "é", "日本", "😀"),
    1 -> Gen.const(""))
  private val textGen: Gen[String] =
    Gen.listOfN(10, charGen).map(_.mkString)

  private def samples(n: Int, seed0: Long): Seq[String] = {
    val seed = org.scalacheck.rng.Seed(seed0)
    Iterator.iterate((textGen.pureApply(Gen.Parameters.default, seed), seed)) {
      case (_, s) =>
        val next = s.next
        (textGen.pureApply(Gen.Parameters.default, next), next)
    }.map(_._1).take(n).toSeq
  }

  test("histogram L1 / 2 lower-bounds true Levenshtein on 400 random pairs") {
    val pairs = samples(400, 11L).zip(samples(400, 23L))
    val df = pairs.toDF("a", "b")
      .withColumn("l1", IntArrayL1(CharHist(col("a")), CharHist(col("b"))))
      // unbanded true distance: thr = max length admits every value
      .withColumn("lev", levenshtein(col("a"), col("b")))
    // violation ⇔ l1 > 2·lev (integer form of ceil(l1/2) > lev —
    // Spark's `/` is double division, which would assert the STRICTER
    // 2·lev > l1 and flag sound boundary pairs where l1 == 2·lev,
    // e.g. pure substitutions)
    val bad = df
      .where(col("l1") > col("lev") * 2)
      .collect()
    assert(bad.isEmpty, s"bound violated: ${bad.take(5).mkString("; ")}")
  }

  test("near-dup pairs (small edits) always survive the d16 conjunct") {
    // the pruning conjunct d16 uses: L1 · 5 ≤ 2 · max(len). A pair
    // that IS a dup (lev · 5 ≤ max len) must never be pruned, since
    // L1 ≤ 2 · lev. Construct dups by small edits on a base text.
    val base = samples(100, 31L).map(s => s + "abcdefghij") // len ≥ 10
    val edited = base.map { s =>
      val sb = new StringBuilder(s)
      sb.setCharAt(sb.length / 2, 'Q') // one substitution
      sb.toString
    }
    val df = base.zip(edited).toDF("a", "b")
      .withColumn("l1", IntArrayL1(CharHist(col("a")), CharHist(col("b"))))
      .withColumn("m", greatest(length(col("a")), length(col("b"))))
      .withColumn("lev", levenshtein(col("a"), col("b")))
      .where(col("lev") * 5 <= col("m")) // actual dups only
    val pruned = df.where(col("l1") * 5 > col("m") * 2).collect()
    assert(pruned.isEmpty,
      s"a true dup was pruned: ${pruned.take(5).mkString("; ")}")
    assert(df.count() > 50, "fixture must produce mostly-dup pairs")
  }

  test("CharHist bins code points, not bytes") {
    // "ßß" vs "ss": 2 multibyte code points vs 2 ASCII — histogram
    // sizes must both total 2 (code-point counts), and the L1 of a
    // string against itself is 0 through any encoding
    val df = Seq(("ßéß😀", "ßéß😀"), ("日本", "本日")).toDF("a", "b")
      .withColumn("l1", IntArrayL1(CharHist(col("a")), CharHist(col("b"))))
      .collect()
    assert(df(0).getAs[Int]("l1") == 0)
    // permutation: identical histograms regardless of byte layout
    assert(df(1).getAs[Int]("l1") == 0)
  }
}
