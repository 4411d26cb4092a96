package graft.llm

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-side BPE trainer at REALISTIC merge counts.
  *
  * x16 proved the cross-engine 3-round trainer (each round a Spark
  * job over the vocabulary, oracle-pinned in DuckDB); a production
  * tokenizer needs hundreds-to-thousands of merges, and at that depth
  * one Spark job per merge is the wrong shape. The scale argument is
  * the one x16's own scaladoc makes: BPE statistics depend ONLY on
  * the (word, count) table — the corpus is touched exactly once for
  * that aggregate, the vocabulary is bounded (Heaps-law sublinear,
  * and in production a fixed model input), so the merge LOOP is
  * model-sized work that belongs on the driver, exactly like Lloyd
  * iterations on k centroids ([[KMeans.fit]]) once the per-round
  * state stopped being corpus-sized.
  *
  * The loop is the standard fast trainer (Sennrich's subword-nmt
  * recipe, public): pair statistics kept incrementally — each merge
  * touches only the words CONTAINING the merged pair (an inverted
  * pair→words index), subtracting their old adjacent-pair counts and
  * adding the new ones — so round cost is proportional to affected
  * words, not the vocabulary. Tie-breaks (freq DESC, lhs, rhs) and
  * left-to-right non-overlapping merge application match
  * [[TextQueries.trainMerges]] exactly; BpeFullSpec pins the first-k
  * equality (greedy BPE's merge sequence is prefix-stable: later
  * rounds never change earlier picks).
  *
  * Training also yields the ENCODED VOCABULARY for free — after the
  * last merge each word's symbol sequence IS its tokenization. That
  * is what the apply side wants: a model-sized word→n_tokens table
  * (broadcast, a parallelized literal — no corpus in its lineage)
  * instead of a thousand nested `replace` calls that would blow the
  * codegen method limit at depth 512.
  */
object Bpe {

  /** (merges, encoded vocab): merge rules as (rank, lhs, rhs, freq);
    * vocab as word → (n_tokens, n_chars).
    */
  def trainFromCounts(
      wordCounts: Seq[(String, Long)],
      nMerges: Int): (Seq[(Long, String, String, Long)],
                      Map[String, Int]) = {
    val n = wordCounts.size
    val wordStr = new Array[String](n)
    val cnts = new Array[Long](n)
    val syms = new Array[mutable.ArrayBuffer[String]](n)
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]

    def addWordPairs(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = pairCounts.getOrElse(p, 0L) + sign * cnts(i)
        if (c == 0L) pairCounts.remove(p) else pairCounts(p) = c
        if (sign > 0)
          pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += i
        j += 1
      }
    }

    var i = 0
    wordCounts.foreach { case (w, c) =>
      wordStr(i) = w; cnts(i) = c
      // initial symbols: one per character (code unit — testdata is
      // ASCII; the x16 twin splits identically via regexp "(.)")
      syms(i) = mutable.ArrayBuffer.from(w.map(_.toString))
      addWordPairs(i, +1L)
      i += 1
    }

    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      // best pair: freq DESC, then (lhs, rhs) ascending — the x16 tie
      // rule. One scan of the pair table per round (pair-table-sized,
      // never corpus-sized).
      var best: ((String, String), Long) = null
      pairCounts.foreach { kv =>
        if (best == null || kv._2 > best._2 ||
          (kv._2 == best._2 &&
            (kv._1._1 < best._1._1 ||
              (kv._1._1 == best._1._1 && kv._1._2 < best._1._2))))
          best = kv
      }
      if (best == null || best._2 <= 0L) done = true
      else {
        val ((l, rh), f) = best
        merges += ((r.toLong, l, rh, f))
        val affected = pairWords.getOrElse((l, rh), mutable.BitSet.empty)
        affected.foreach { wi =>
          val s = syms(wi)
          // the word may no longer contain the pair (stale index
          // entry after an earlier merge) — check cheaply first
          var has = false
          var j = 0
          while (!has && j < s.length - 1) {
            if (s(j) == l && s(j + 1) == rh) has = true
            j += 1
          }
          if (has) {
            addWordPairs(wi, -1L)
            // merge application MUST be the twins' exact semantics:
            // 4 passes of literal leftmost-non-overlapping string
            // replace on the space-wrapped sequence (Java, Spark and
            // DuckDB `replace` all agree). A plain left-to-right
            // array merge is NOT equivalent on runs of a repeated
            // symbol — replace consumes the trailing space of a
            // match, so the immediately following pair is skipped
            // within a pass ("aaaaaa" → [aa,a,aa,a] under replace,
            // [aa,aa,aa] under naive LTR; BpeFullSpec pins the
            // repeated-run case).
            var str = s.mkString(" ", " ", " ")
            val (pat, rep) = (s" $l $rh ", s" $l$rh ")
            var p = 0
            while (p < 4) { str = str.replace(pat, rep); p += 1 }
            syms(wi) = mutable.ArrayBuffer.from(
              str.trim.split(' ').filter(_.nonEmpty))
            addWordPairs(wi, +1L)
          }
        }
        pairCounts.remove((l, rh))
        pairWords.remove((l, rh))
        r += 1
      }
    }
    (merges.result(),
      wordStr.indices.map(j => wordStr(j) -> syms(j).length).toMap)
  }

  /** One corpus scan for the (word, count) table (identical aggregate
    * to x16's), then the driver loop.
    */
  def train(
      s: SparkSession, d: String, nMerges: Int)
      : (Seq[(Long, String, String, Long)], Map[String, Int]) = {
    val wc = graft.Tables.documents(s, d)
      .select(explode(
        graft.functions.WsTokens(col("text")))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect()
      .map(row => (row.getString(0), row.getLong(1)))
      .sortBy(_._1) // deterministic driver-side order
      .toSeq
    trainFromCounts(wc, nMerges)
  }

  /** The trained tokenizer applied to a corpus: explode words, map
    * each through the broadcast word→n_tokens MODEL table (a
    * parallelized literal — vocabulary-sized, no corpus in its
    * lineage, the registry artifact a production run would load), and
    * aggregate per document. Unseen words fall back to character
    * count (zero merges apply — correct for a word the trainer never
    * saw, here impossible since train corpus = apply corpus).
    */
  def encodeCorpus(
      s: SparkSession, d: String, vocab: Map[String, Int]): DataFrame = {
    import s.implicits._
    val vocabDf = vocab.toSeq.sortBy(_._1).toDF("word", "n_toks")
    graft.Tables.documents(s, d)
      .select(col("doc_id"), explode(
        graft.functions.WsTokens(col("text")))
        .as("word"))
      .join(broadcast(vocabDf), Seq("word"), "left")
      .select(col("doc_id"),
        length(col("word")).cast("long").as("n_chars"),
        coalesce(col("n_toks"), length(col("word")))
          .cast("long").as("n_toks"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_chars")).as("n_char_tokens"),
        sum(col("n_toks")).as("n_bpe_tokens"),
        expr("sum(n_toks) * 1000000L DIV sum(n_chars)").as("bpe_ppm"))
      .orderBy("doc_id")
  }
}
