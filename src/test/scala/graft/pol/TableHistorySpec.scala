package graft.pol

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.spark

/** DESCRIBE HISTORY over the keyed table: every write path must leave
  * an auditable (operation, commit time, row count, file churn) row,
  * answered from manifests alone — the operability surface a table
  * owner uses to see what happened without scanning anything.
  */
class TableHistorySpec extends AnyFunSuite {
  import spark.implicits._

  test("full lifecycle leaves an op-labelled, row-counted history") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hist")
      .resolve("table").toString
    val t0 = System.currentTimeMillis()
    PoolJsonSink.upsertPartitioned(spark, dir,
      (0 until 100).map(i => (s"k$i", i.toLong)).toDF("k", "v"),
      col("k"), nBuckets = 4)
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("k3", 333L), ("k_new", 1L)).toDF("k", "v"), col("k"))
    PoolJsonSink.deletePartitioned(spark, dir,
      (0 until 50).map(i => s"k$i").toDF("k"), col("k"))
    // clusterBy forces the OPTIMIZE relayout commit (with optimized
    // writes on, plain compaction finds no fat buckets to squash)
    PoolJsonSink.compactPartitions(spark, dir, clusterBy = Seq("v"))
    PoolJsonSink.splitBuckets(spark, dir, col("k"))

    val h = PoolJsonSink.tableHistory(spark, dir).orderBy("version")
      .collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(h.map(_.getString(1)).toSeq ==
      Seq("UPSERT", "UPSERT", "DELETE", "OPTIMIZE", "SPLITBUCKETS"))
    // commit times recorded and sane
    h.foreach { r =>
      val ts = r.getTimestamp(2)
      assert(ts != null && ts.getTime >= t0 &&
        ts.getTime <= System.currentTimeMillis())
    }
    // snapshot row counts: 100 → 101 → 51 → 51 → 51
    assert(h.map(_.getLong(5)).toSeq == Seq(100L, 101L, 51L, 51L, 51L))
    // bucket count doubles at the split
    assert(h.map(_.getInt(3)).toSeq == Seq(4, 4, 4, 4, 8))
    // file churn vs previous version is non-null everywhere (v1 diffs
    // against the empty table) and the delete removed more than it
    // added is not guaranteed — but OPTIMIZE must remove at least as
    // many files as it adds (that is its purpose)
    h.foreach { r =>
      assert(!r.isNullAt(6) && !r.isNullAt(7), s"null churn at $r")
    }
    val opt = h(3)
    assert(opt.getInt(7) >= opt.getInt(6))

    // SQL face
    val sqlH = spark.read.format("graft").option("history", "true")
      .load(dir).orderBy("version")
      .select("operation").as[String].collect().toSeq
    assert(sqlH ==
      Seq("UPSERT", "UPSERT", "DELETE", "OPTIMIZE", "SPLITBUCKETS"))
  }

  test("vacuumed history: the oldest retained version reports null " +
    "churn (its predecessor is gone), later ones stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hist_vac")
      .resolve("table").toString
    (0 until 3).foreach { b =>
      PoolJsonSink.upsertPartitioned(spark, dir,
        Seq((s"k$b", b.toLong)).toDF("k", "v"), col("k"), nBuckets = 2)
    }
    PoolJsonSink.vacuum(dir, retainVersions = 2)
    val h = PoolJsonSink.tableHistory(spark, dir).orderBy("version")
      .collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(h(0).isNullAt(6) && h(0).isNullAt(7))
    assert(!h(1).isNullAt(6) && !h(1).isNullAt(7))
  }
}
