package graft.pol

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.spark

/** Round-13: the commit path's per-file parquet footer harvest runs
  * on a bounded pool (`PoolJsonSink.footerStats`). The pooled harvest
  * must be byte-identical to a per-file sequential harvest — same
  * keys, same min/max, same __rows/__bytes/__nulls pseudo entries —
  * for any file count, including the 1-file case that bypasses the
  * pool and files with all-null stat columns.
  */
class FooterStatsPoolSpec extends AnyFunSuite {

  private def stage(n: Int, withNulls: Boolean = false): (String, Seq[String]) = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_footerstats").toString
    val base = spark.range(0, n * 50L)
      .select(col("id").as("k"),
        (if (withNulls) lit(null).cast("long") else col("id") * 3)
          .as("v"))
    base.repartition(n, col("k"))
      .write.mode("overwrite").parquet(s"$dir/data/part")
    val rels = new java.io.File(s"$dir/data/part").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => s"data/part/${f.getName}").toSeq.sorted
    (dir, rels)
  }

  private def sequential(
      dir: String, rels: Seq[String], cols: Seq[String]) =
    // the pre-round-13 shape: one file at a time (the pool degrades
    // to exactly this for a single rel)
    rels.flatMap(r =>
      PoolJsonSink.footerStats(spark, dir, Seq(r), cols)).toMap

  test("pooled harvest equals per-file sequential harvest") {
    val (dir, rels) = stage(24)
    assert(rels.size == 24)
    val pooled = PoolJsonSink.footerStats(spark, dir, rels, Seq("k", "v"))
    val seq = sequential(dir, rels, Seq("k", "v"))
    assert(pooled == seq)
    assert(pooled.size == 24)
    // every file carries the pseudo entries the manifest relies on
    pooled.values.foreach { m =>
      assert(m.contains(PoolJsonSink.RowsStatCol))
      assert(m.contains(PoolJsonSink.BytesStatCol))
      assert(m.contains("k"))
    }
  }

  test("all-null stat columns are omitted identically under the pool") {
    val (dir, rels) = stage(4, withNulls = true)
    val pooled = PoolJsonSink.footerStats(spark, dir, rels, Seq("k", "v"))
    val seq = sequential(dir, rels, Seq("k", "v"))
    assert(pooled == seq)
    // v has no non-null values: min/max omitted, null count recorded
    pooled.values.foreach { m =>
      assert(!m.contains("v"))
      assert(m.contains(s"${PoolJsonSink.NullsStatColPrefix}v"))
    }
  }

  test("a failing file fails the whole harvest, as the loop did") {
    val (dir, rels) = stage(3)
    val bad = rels :+ "data/part/does-not-exist.parquet"
    intercept[Exception] {
      PoolJsonSink.footerStats(spark, dir, bad, Seq("k"))
    }
  }
}
