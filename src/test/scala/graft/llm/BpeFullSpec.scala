package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.{spark, sf0001}

/** The driver-loop BPE trainer at depth: equivalence with the Spark
  * per-round loop on its own turf, prefix stability, and realistic
  * merge counts (1024) on a realistic synthetic vocabulary — the
  * scale the x16/x20 oracles can't reach.
  */
class BpeFullSpec extends AnyFunSuite {

  test("driver trainer reproduces the Spark-loop x16 merges exactly") {
    val sparkLoop = TextQueries.trainMerges(spark, sf0001)
    val (driver, _) = Bpe.train(spark, sf0001, 3)
    assert(driver == sparkLoop)
  }

  /** Deterministic synthetic vocabulary with Zipf-ish counts — no
    * RNG, realistic shape: ~20k distinct "words" over a 12-symbol
    * alphabet with heavy shared substructure (what makes BPE merges
    * meaningful).
    */
  private def syntheticVocab(n: Int): Seq[(String, Long)] = {
    val syll = Vector("ba", "ko", "ri", "ta", "en", "lo", "mi", "su",
      "dra", "pel", "ver", "qu")
    (0 until n).map { i =>
      val len = 2 + (scala.util.hashing.MurmurHash3.stringHash(
        s"len_$i").abs % 4)
      val w = (0 until len).map { j =>
        syll(scala.util.hashing.MurmurHash3.stringHash(
          s"syl_${i}_$j").abs % syll.size)
      }.mkString
      (w, (1000000L / (i + 1)) + 1) // Zipf-ish
    }.groupBy(_._1).map { case (w, g) =>
      (w, g.map(_._2).sum)
    }.toSeq.sortBy(_._1)
  }

  test("1024 merges on a 20k-word vocabulary: trains, prefix-stable, monotone") {
    val vocab = syntheticVocab(20000)
    assert(vocab.size > 1000)
    val t0 = System.nanoTime()
    val (m1024, enc1024) = Bpe.trainFromCounts(vocab, 1024)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"${vocab.size} words, ${m1024.size} merges in $secs%.2f s")
    assert(m1024.size == 1024 || m1024.size > 256,
      s"expected deep training, got ${m1024.size} merges")

    // prefix stability: greedy BPE's first k merges never depend on
    // how many more rounds run after them
    val (m256, enc256) = Bpe.trainFromCounts(vocab, 256)
    assert(m1024.take(m256.size) == m256)

    // more merges can only shrink (or keep) every word's token count
    val (_, enc64) = Bpe.trainFromCounts(vocab, 64)
    vocab.foreach { case (w, _) =>
      assert(enc1024(w) <= enc256(w) && enc256(w) <= enc64(w) &&
        enc64(w) <= w.length)
    }
    // and deep training really compresses: mean tokens/word well
    // under the character baseline
    val totToks = vocab.map { case (w, _) => enc1024(w).toLong }.sum
    val totChars = vocab.map(_._1.length.toLong).sum
    assert(totToks * 3 < totChars,
      s"1024 merges should compress ≥3x: $totToks toks / $totChars chars")
  }

  test("merge loop stops cleanly when the vocabulary is exhausted") {
    val (m, enc) = Bpe.trainFromCounts(
      Seq(("aa", 5L), ("ab", 3L)), 1000)
    // aa -> 1 merge, ab -> 1 merge; then no pairs remain
    assert(m.size == 2)
    assert(enc("aa") == 1 && enc("ab") == 1)
  }

  /** The twins' merge application: 4 passes of literal leftmost-
    * non-overlapping replace on the space-wrapped sequence — the
    * reference for the spot check below.
    */
  private def replaceApply(
      w: String, merges: Seq[(Long, String, String, Long)]): Int = {
    var str = w.map(_.toString).mkString(" ", " ", " ")
    merges.foreach { case (_, l, r, _) =>
      val (pat, rep) = (s" $l $r ", s" $l$r ")
      (1 to 4).foreach(_ => str = str.replace(pat, rep))
    }
    str.trim.split(' ').count(_.nonEmpty)
  }

  test("repeated-symbol runs follow the replace semantics, not naive LTR") {
    // "aaaaaa" under replace-merge of (a,a) is [aa, a, aa, a]: the
    // replacement consumes the trailing separator, so the straddling
    // pair is skipped — the detail that makes the driver trainer
    // byte-equal to the Spark/DuckDB string-replace twins
    val (m, enc) = Bpe.trainFromCounts(Seq(("aaaaaa", 7L)), 1)
    assert(m.head._2 == "a" && m.head._3 == "a")
    assert(enc("aaaaaa") == 4,
      s"expected replace semantics (4 tokens), got ${enc("aaaaaa")}")
    assert(enc("aaaaaa") == replaceApply("aaaaaa", m))
  }

  test("x20 encode equals per-word rule application (spot check)") {
    val (merges, vocab) = Bpe.train(spark, sf0001, 12)
    assert(merges.size == 12)
    vocab.keys.toSeq.sorted.take(10).foreach { w =>
      assert(replaceApply(w, merges) == vocab(w),
        s"word '$w': replace=${replaceApply(w, merges)} " +
          s"trainer=${vocab(w)}")
    }
  }
}
