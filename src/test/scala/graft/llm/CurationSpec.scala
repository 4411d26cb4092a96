package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Pins the curation operators where the DuckDB oracle can't reach:
  * the LSH pair graph on the testdata is near-clique-shaped, so the
  * oracle never forces multi-round label propagation — a chain graph
  * does. Quantization invariants hold for every vector, not just the
  * 500 oracle rows.
  */
class CurationSpec extends AnyFunSuite {
  import graft.QueryHarness._

  test("connected components converges on a chain (multi-round propagation)") {
    import spark.implicits._
    // 1-2-3-4-5 chain plus an isolated pair 10-11: min-label needs
    // several rounds to walk the chain end to end.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = CurationQueries.connectedComponents(pairs, localMax = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components: labels flow against edge direction too") {
    import spark.implicits._
    // min id sits at the DST end of every edge — propagation must use
    // both directions to find it.
    val pairs = Seq((5L, 1L), (9L, 5L)).toDF("doc_a", "doc_b")
    val got = CurationQueries.connectedComponents(pairs, localMax = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 5L -> 1L, 9L -> 1L))
  }

  test("connected components matches union-find on seeded random graphs") {
    import spark.implicits._
    var state = 7L
    def next(mod: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (Math.floorMod(state >>> 11, mod.toLong)).toInt
    }
    (1 to 8).foreach { trial =>
      val n = 6 + next(20)
      val edges = (0 until n).map(_ => (next(n).toLong, next(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // driver-side union-find oracle
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // min doc_id per component, matching the min-label semantics
        val byRoot = verts.groupBy(find)
        val want = verts.map(v => v -> byRoot(find(v)).min).toMap
        val got = CurationQueries.connectedComponents(
            edges.toDF("doc_a", "doc_b"), localMax = 0)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"trial $trial: graph $edges")
      }
    }
  }

  test("connected components: empty pair graph yields empty labels, no NPE") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(CurationQueries.connectedComponents(pairs, localMax = 0).collect().isEmpty)
    assert(CurationQueries.connectedComponentsStar(pairs).collect().isEmpty)
  }

  test("star contraction matches union-find on seeded random graphs") {
    import spark.implicits._
    var state = 11L
    def next(mod: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (Math.floorMod(state >>> 11, mod.toLong)).toInt
    }
    (1 to 8).foreach { trial =>
      val n = 6 + next(20)
      val edges = (0 until n).map(_ => (next(n).toLong, next(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val byRoot = verts.groupBy(find)
        val want = verts.map(v => v -> byRoot(find(v)).min).toMap
        val got = CurationQueries.connectedComponentsStar(
            edges.toDF("doc_a", "doc_b"), localMax = 0)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"trial $trial: graph $edges")
      }
    }
  }

  test("both CC variants are log-round-bounded on a path graph") {
    import spark.implicits._
    // a 64-node path is the adversarial shape for naive label
    // propagation: the min label must travel the full diameter (63
    // hops → 63 rounds without jumping). Star contraction rewrites the
    // edges themselves; min-label with pointer jumping + seeded init
    // doubles label travel per round. Both must land in O(log n)
    // rounds — measured 6 (min-label) and 7 (star); star's remaining
    // value is that per-round WORK shrinks with the contracting edge
    // set and needs no separate vertex-label table, which is the
    // safety margin for high-degree + long-path graph mixes.
    val path = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (lblMin, roundsMin) =
      CurationQueries.connectedComponentsWithRounds(path, localMax = 0)
    val (lblStar, roundsStar) =
      CurationQueries.connectedComponentsStarWithRounds(path, localMax = 0)
    val wantAll0 = (0L to 63L).map(_ -> 0L).toMap
    assert(lblMin.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == wantAll0)
    assert(lblStar.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == wantAll0)
    assert(roundsMin <= 8 && roundsStar <= 8,
      s"rounds not log-bounded: min-label $roundsMin, star $roundsStar " +
        "(naive propagation would need 63)")
  }

  test("size-gated local union-find path equals the distributed path") {
    import spark.implicits._
    var state = 23L
    def next(mod: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (Math.floorMod(state >>> 11, mod.toLong)).toInt
    }
    (1 to 6).foreach { trial =>
      val n = 6 + next(24)
      val edges = (0 until n).map(_ => (next(n).toLong, next(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val df = edges.toDF("doc_a", "doc_b")
        def m(got: org.apache.spark.sql.DataFrame) =
          got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val localMin = m(CurationQueries.connectedComponents(df))
        val distMin = m(CurationQueries.connectedComponents(df, localMax = 0))
        val localStar = m(CurationQueries.connectedComponentsStar(df))
        val distStar =
          m(CurationQueries.connectedComponentsStar(df, localMax = 0))
        assert(localMin == distMin, s"trial $trial min-label: graph $edges")
        assert(localStar == distStar, s"trial $trial star: graph $edges")
      }
    }
  }

  test("hash split partitions every doc exactly once") {
    val rows = CurationQueries.queries("c2_hash_split")(spark, sf0001)
      .collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val docs = graft.Tables.documents(spark, sf0001).count()
    assert(total == docs)
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "val"))
  }

  test("quota sample: exactly k rows per source, ranks 1..k") {
    val rows = CurationQueries.queries("c3_quota_sample")(spark, sf0001)
      .collect()
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.values.forall(_.length == 5))
    assert(bySource.values.forall(_.map(_.getInt(1)).sorted.toSeq == (1 to 5)))
  }

  test("int8 quantization invariants: |q| bounded, max|x| hits ±127") {
    val rows = SimilarityQueries.queries("n4_embedding_quantize")(spark, sf0001)
      .collect()
    rows.foreach { r =>
      val (qmin, qmax) = (r.getAs[Long]("qmin"), r.getAs[Long]("qmax"))
      // floor(x/scale) ranges over [-128, 127] for |x| <= max|x|
      assert(qmin >= -128 && qmax <= 127, s"vec ${r.getLong(0)}: [$qmin,$qmax]")
      // the element that set the scale quantizes to (within a float
      // division ulp of) full range
      assert(qmax >= 126 || qmin <= -126, s"vec ${r.getLong(0)} never saturates")
    }
  }
}
