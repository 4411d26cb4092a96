package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The top-k aggregator's scale contract is that PARTIAL aggregation
  * is invisible: any partitioning of the input into reduce chunks,
  * merged in any order, must equal the global sort-take-k. Spark only
  * exercises one merge shape per run, so the property is pinned here
  * directly against random splits and merge orders.
  */
class TopKAggSpec extends AnyFunSuite {

  private val k = 5
  private val agg = TopKAgg.topKByKey(k)

  private var state = 13L
  private def next(mod: Int): Int = {
    state = state * 6364136223846793005L + 1442695040888963407L
    Math.floorMod(state >>> 11, mod.toLong).toInt
  }

  private def randomInput(n: Int): Seq[(String, Long)] =
    (0 until n).map { _ =>
      // duplicate-heavy keys exercise the (key, id) tiebreak
      (f"k${next(40)}%02d", next(1000).toLong)
    }

  private def oracle(in: Seq[(String, Long)]): Seq[Long] =
    in.sorted.take(k).map(_._2)

  test("random splits + shuffled merge order == global sort-take-k") {
    (1 to 20).foreach { trial =>
      val in = randomInput(1 + next(200))
      // split into 1..6 chunks at random boundaries
      val nChunks = 1 + next(6)
      val chunks = in.grouped(math.max(1, in.length / nChunks)).toSeq
      var bufs = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
      // merge in a shuffled order, pairwise
      while (bufs.length > 1) {
        val i = next(bufs.length - 1)
        val merged = agg.merge(bufs(i), bufs(i + 1))
        bufs = bufs.patch(i, Seq(merged), 2)
      }
      val got = agg.finish(bufs.head).ids
      assert(got == oracle(in), s"trial $trial over ${in.length} rows")
    }
  }

  test("fewer than k inputs returns all, in rank order") {
    val in = Seq(("b", 2L), ("a", 9L), ("a", 1L))
    val got = agg.finish(in.foldLeft(agg.zero)(agg.reduce)).ids
    assert(got == Seq(1L, 9L, 2L))
  }

  test("buffer never holds more than 4k entries") {
    val in = randomInput(500)
    val buf = in.foldLeft(agg.zero)(agg.reduce)
    assert(buf.items.length <= 4 * k)
  }

  // --- topKByScore (the n5 k-NN-join variant: DESC score, ASC id) ---

  private val sAgg = TopKAgg.topKByScore(k)

  private def randomScored(n: Int): Seq[(Double, Long)] =
    (0 until n).map { _ =>
      // coarse score grid forces ties → exercises the id tiebreak
      (next(20) / 10.0, next(1000).toLong)
    }

  private def scoredOracle(in: Seq[(Double, Long)]): Seq[(Long, Double)] =
    in.sortBy { case (s, id) => (-s, id) }.take(k)
      .map { case (s, id) => (id, s) }

  test("score variant: random splits + shuffled merges == sort-take-k") {
    (1 to 20).foreach { trial =>
      val in = randomScored(1 + next(200))
      val nChunks = 1 + next(6)
      val chunks = in.grouped(math.max(1, in.length / nChunks)).toSeq
      var bufs = chunks.map(c => c.foldLeft(sAgg.zero)(sAgg.reduce))
      while (bufs.length > 1) {
        val i = next(bufs.length - 1)
        val merged = sAgg.merge(bufs(i), bufs(i + 1))
        bufs = bufs.patch(i, Seq(merged), 2)
      }
      val got = sAgg.finish(bufs.head).items.map(h => (h.id, h.score))
      assert(got == scoredOracle(in), s"trial $trial over ${in.length} rows")
    }
  }

  test("score variant ranks descending with ascending-id tiebreak") {
    val in = Seq((0.5, 7L), (0.9, 3L), (0.9, 1L), (0.1, 9L), (0.5, 2L))
    val got = sAgg.finish(in.foldLeft(sAgg.zero)(sAgg.reduce)).items
      .map(h => (h.id, h.score))
    assert(got == Seq((1L, 0.9), (3L, 0.9), (2L, 0.5), (7L, 0.5), (9L, 0.1)))
  }

  test("score variant buffer never holds more than 4k entries") {
    val buf = randomScored(500).foldLeft(sAgg.zero)(sAgg.reduce)
    assert(buf.items.length <= 4 * k)
  }
}
