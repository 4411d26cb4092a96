package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.{spark, sf0001}

/** Round-4 operators: c8 canonical selection policy and n6 partition
  * pruning. The oracle pins both on the testdata; these specs pin the
  * SEMANTICS on adversarial inputs (c8: the best copy must win, not
  * the first or min-id one) and the SCALE MECHANISM (n6: the scan
  * must plan only the probed partitions — the whole point of storing
  * the cluster id as a partition column).
  */
class NewCurationOpsSpec extends AnyFunSuite {
  import spark.implicits._

  test("c8 keeps the longest copy, then the lowest doc_id") {
    val dir = java.nio.file.Files.createTempDirectory("graft_c8").toString
    // one shared 64-char head, different tails/lengths; a tie pair;
    // and a singleton
    val head = "H" * 64
    Seq(
      (10L, head + " short", "en", "s", (head + " short").length.toLong),
      (11L, head + " the much longer and more complete copy", "en", "s",
        (head + " the much longer and more complete copy").length.toLong),
      (12L, head + " mid-size copy here", "en", "s",
        (head + " mid-size copy here").length.toLong),
      (20L, "tie " * 16 + "A", "en", "s", ("tie " * 16 + "A").length.toLong),
      (21L, "tie " * 16 + "B", "en", "s", ("tie " * 16 + "B").length.toLong),
      (30L, "solo document", "en", "s", "solo document".length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("c8_keep_best_duplicate")(spark, dir)
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    // longest of the 3-copy group wins regardless of id order
    assert(got == Map(11L -> 3L, 20L -> 2L, 30L -> 1L))
  }

  test("n6 plans only the probed trained-cluster partitions") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.SparkEntry.queries("n6_ann_ivf_partitioned")(
        spark, sf0001)
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location")
              .exists(_.contains("graft_ivf_trained")) => f
      }
      assert(scans.nonEmpty, "no trained-index scan in the n6 plan")
      // 8 trained clusters exist; the probe selects exactly 2 as a
      // LITERAL IN — that is the planning-time prune ("cid#64 IN (2,5)")
      val pf = scans.head.metadata("PartitionFilters")
      assert("cid#\\d+ IN \\(\\d+,\\d+\\)".r.findFirstIn(pf).isDefined,
        s"expected a 2-cluster literal partition filter, got: $pf")
      // and the probe-side filter reaches the parquet reader
      assert(scans.head.metadata("PushedFilters").contains("vec_id"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("n6's index path equals the direct trained-model computation") {
    // the partitioned index is a LAYOUT: build+prune+read must return
    // exactly what assigning + filtering the trained model directly
    // returns (catches a stale index, a broken partition write, or a
    // probe ranking divergence)
    val model = KMeans.fit(spark, sf0001)
    val t = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("norm",
        sqrt(graft.functions.DotProduct(col("e"), col("e"))))
      .withColumn("ee", graft.functions.DotProduct(col("e"), col("e")))
      .withColumn("cid", KMeans.assignCol(model.centroids).getField("cid"))
    val q = t.where(col("vec_id") === 0).select(
      col("e").as("qe"), col("norm").as("qnorm")).head
    val qe = q.getSeq[Double](0).toArray
    val probed = model.centroids.map { case (cid, ce) =>
      (cid, ce.zip(qe).foldLeft(0.0) { case (a, (x, y)) => a + x * y })
    }.sortBy { case (cid, s) => (-s, cid) }.take(2).map(_._1)
    val direct = t
      .where(col("cid").isin(probed: _*) && col("vec_id") =!= 0)
      .withColumn("cos", round(
        graft.functions.DotProduct(col("e"), typedlit(qe.toSeq)) /
          (col("norm") * lit(q.getDouble(1))), 6))
      .select(col("vec_id"), col("cid"), col("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val viaIndex = graft.SparkEntry.queries("n6_ann_ivf_partitioned")(
        spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(viaIndex.toSeq == direct.toSeq)
  }

  test("x14 chunks reconstruct every document (property, seeded random)") {
    // The chunker's contract: 256-char windows every 224 chars means
    // consecutive chunks overlap by exactly 32 chars, so
    // chunk0 ++ tail.map(_.drop(32)) must equal the document — for
    // ANY length, including shorter-than-one-window docs, exact
    // window-boundary lengths, and whitespace-heavy text.
    val rnd = new scala.util.Random(42)
    val lengths = Seq(0, 1, 31, 32, 224, 225, 255, 256, 257, 448, 480) ++
      Seq.fill(40)(rnd.nextInt(1200))
    val docs = lengths.zipWithIndex.map { case (n, i) =>
      val sb = new StringBuilder
      while (sb.length < n) sb.append(
        if (rnd.nextInt(6) == 0) ' ' else ('a' + rnd.nextInt(26)).toChar)
      (i.toLong, sb.toString, "en", "s", n.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_x14").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // chunk text is not emitted (digests are) — re-derive each chunk
    // from (start, n_chars) against the original for the check
    val byDoc = graft.SparkEntry.queries("x14_chunk")(spark, dir)
      .select("doc_id", "chunk_id", "start", "n_chars")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val texts = docs.map(d => d._1 -> d._2).toMap
    texts.foreach { case (id, text) =>
      if (text.isEmpty) assert(!byDoc.contains(id))
      else {
        val cs = byDoc(id)
        val pieces = cs.map { case (_, _, start, n) =>
          text.substring(start.toInt - 1, start.toInt - 1 + n.toInt)
        }
        val rebuilt = pieces.head + pieces.tail.map(_.drop(32)).mkString
        assert(rebuilt == text, s"doc $id not reconstructible")
      }
    }
  }
}
