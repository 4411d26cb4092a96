package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.{spark, sf0001}

/** Round-5 operators: event analytics (w3 funnel, w4 cohorts), dedup
  * observability (c11), binary-quantized ANN (n11), the composed
  * IVF-PQ index (n12), and BPE merge training (x16). The DuckDB
  * oracle pins every result on the testdata; these specs pin the
  * SEMANTIC invariants (funnel monotonicity, signature geometry, BPE
  * fixpoint) and the SCALE MECHANISMS (single event scan + bounded
  * exchanges, partition-pruned IVF-PQ scan, join-free encodes).
  */
class Round5OpsSpec extends AnyFunSuite {
  import spark.implicits._

  private def exec(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("w3 funnel: stages are monotone and rates are consistent PPM") {
    val r = exec("w3_funnel").head()
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel must narrow: $v >= $c >= $p")
    assert(r.getLong(3) == c * 1000000L / v)
    assert(r.getLong(4) == p * 1000000L / v)
  }

  test("w3 funnel plan scans events once (no per-stage re-join)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = exec("w3_funnel").queryExecution.executedPlan
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.size == 1, s"expected 1 events scan, got ${scans.size}")
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // one user_id exchange feeding the chained windows + same-key
      // agg, one single-partition exchange for the global rollup
      assert(shuffles.size <= 2,
        s"expected <=2 exchanges, got ${shuffles.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("w4 cohorts: offsets start at signup and never precede it") {
    val rows = exec("w4_retention_cohort")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "week offsets are non-negative")
    assert(rows.forall(_._3 >= 1))
    // every cohort retains itself at offset 0 (the signup event is an
    // activity on the cohort day)
    val cohorts = rows.map(_._1).distinct
    val withZero = rows.filter(_._2 == 0).map(_._1).distinct
    assert(cohorts.sorted.sameElements(withZero.sorted))
  }

  test("c11: distinct counts are ordered and rates match the counts") {
    val rows = exec("c11_source_dup_stats")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, uniq, prefixUniq, dupPpm, prefPpm) =>
      assert(uniq <= n)
      // the 64-char prefix key is coarser than the full-text key
      assert(prefixUniq <= uniq)
      assert(dupPpm == (n - uniq) * 1000000L / n)
      assert(prefPpm == (n - prefixUniq) * 1000000L / n)
    }
  }

  test("n11: hamming in [0,64], sorted, probe excluded, and the " +
    "signature matches a driver-side recount") {
    val rows = exec("n11_binary_hamming").as[(Long, Long)].collect()
    assert(rows.length == 10)
    assert(rows.forall(_._1 != 0L))
    assert(rows.forall { case (_, h) => h >= 0 && h <= 64 })
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    // recompute the best match's hamming straight from the vectors
    val best = rows.head
    val vecs = Tables.embeddings(spark, sf0001)
      .where(col("vec_id").isin(0L, best._1))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val recount = vecs(0L).zip(vecs(best._1))
      .count { case (a, b) => (a >= 0) != (b >= 0) }
    assert(recount.toLong == best._2)
  }

  test("n11 signature encode is join-free below the probe broadcast") {
    // everything under the 1-row probe join is a map-only projection:
    // no shuffle exchange anywhere in the plan
    val plan = exec("n11_binary_hamming").queryExecution.executedPlan
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "binary ANN must not shuffle the corpus")
  }

  test("n12 plans only the probed partitions and joins nothing") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = exec("n12_ivf_pq")
      val plan = df.queryExecution.executedPlan
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location")
              .exists(_.contains("graft_ivfpq2_trained")) => f
      }
      assert(scans.nonEmpty, "no trained-index scan in the n12 plan")
      val pf = scans.head.metadata("PartitionFilters")
      assert("cid#\\d+ IN \\(\\d+,\\d+\\)".r.findFirstIn(pf).isDefined,
        s"expected a 2-cluster literal partition filter, got: $pf")
      // the index stores codes, not vectors: the serving scan reads
      // 32 B of codes per row, never a float embedding
      val readSchema = scans.head.metadata("ReadSchema")
      assert(readSchema.contains("codes") && !readSchema.contains("e:"),
        s"serving must read codes only, got: $readSchema")
      // ADC is literal-table arithmetic: the whole query is join-free
      val joins = plan.collect {
        case j if j.nodeName.contains("Join") => j.nodeName
      }
      assert(joins.isEmpty, s"IVF-PQ serving must not join: $joins")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("n12 distances are nonnegative, sorted, probe excluded") {
    val rows = exec("n12_ivf_pq").as[(Long, Long, Double)].collect()
    assert(rows.length == 10)
    assert(rows.forall(_._1 != 0L))
    assert(rows.forall(_._3 >= 0.0))
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
    // coarse pruning: every served row comes from one of at most 2
    // clusters
    assert(rows.map(_._2).distinct.length <= 2)
  }

  test("x16: 3 merge rules, round-1 symbols are single chars, and " +
    "4 replace passes reach the fixpoint") {
    val merges = exec("x16_bpe_train")
      .as[(Long, String, String, Long)].collect()
    assert(merges.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(merges.forall(_._4 > 0))
    val r1 = merges.head
    assert(r1._2.length == 1 && r1._3.length == 1,
      "first merge joins two base characters")
    // replay the merge applications over the word table and assert
    // pass 5 is a no-op for every learned rule (the 4-pass fixpoint
    // claim the oracle relies on)
    var cur = Tables.documents(spark, sf0001)
      .select(explode(
        expr("filter(split(lower(text), '\\\\s+'), x -> x <> '')"))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(concat(lit(" "),
        regexp_replace(col("word"), "(.)", "$1 ")).as("seq"), col("cnt"))
    merges.foreach { case (_, l, r, _) =>
      val (pat, rep) = (lit(s" $l $r "), lit(s" $l$r "))
      cur = cur.select(
        (1 to 4).foldLeft(col("seq"))((c, _) => replace(c, pat, rep))
          .as("seq"), col("cnt"))
      assert(cur.where(col("seq").contains(s" $l $r ")).isEmpty,
        s"rule ($l,$r) not at fixpoint after 4 passes")
    }
  }
}
