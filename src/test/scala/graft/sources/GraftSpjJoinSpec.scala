package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.spark
import graft.pol.PoolJsonSink

/** Storage-partitioned join through `format("graft-spj")`: two keyed
  * tables sharing nBuckets must join with ZERO shuffle of either side
  * (the 100 TB fact⋈fact case the v1 relation cannot plan), and the
  * result must equal the plain (shuffling) join.
  */
class GraftSpjJoinSpec extends AnyFunSuite {
  import spark.implicits._

  private val n = 8

  private def mkTables(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_spj").toString
    val (la, lb) = (s"$root/a", s"$root/b")
    val a = (1L to 500L).map(i => (i, s"left-$i", i % 7)).toDF("k", "av", "ag")
    // right side misses some keys and brings its own payload
    val b = (1L to 500L).filter(_ % 3 != 0)
      .map(i => (i, i * 10.0)).toDF("k", "bv")
    PoolJsonSink.overwritePartitioned(spark, la, a, col("k"), n)
    PoolJsonSink.overwritePartitioned(spark, lb, b, col("k"), n)
    (la, lb)
  }

  test("spj join result equals the plain join, with zero exchange") {
    val (la, lb) = mkTables()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = GraftSpj.join(spark, la, lb, "k", "k")
        .select(col("k"), col("av"), col("bv"))
      val plan = joined.queryExecution.executedPlan
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"SPJ must elide all exchanges, found ${shuffles.size}:\n$plan")
      val got = joined.as[(Long, String, Double)].collect().sortBy(_._1)
      val want = (1L to 500L).filter(_ % 3 != 0)
        .map(i => (i, s"left-$i", i * 10.0))
      assert(got.toSeq == want)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("empty buckets pad partition values so sparse tables still align") {
    val root = java.nio.file.Files.createTempDirectory("graft_spj2").toString
    // 2 keys across 8 buckets: most buckets empty on both sides
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "av")
    val b = Seq((2L, 2.0), (99L, 9.0)).toDF("k", "bv")
    PoolJsonSink.overwritePartitioned(spark, s"$root/a", a, col("k"), n)
    PoolJsonSink.overwritePartitioned(spark, s"$root/b", b, col("k"), n)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = GraftSpj.join(spark, s"$root/a", s"$root/b", "k", "k")
        .select(col("av"), col("bv"))
      assert(j.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty)
      assert(j.as[(String, Double)].collect().toSeq == Seq(("y", 2.0)))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("column pruning reaches the spj parquet reader") {
    val (la, _) = mkTables()
    val one = GraftSpj.read(spark, la).select("av")
    assert(one.schema.fieldNames.toSeq == Seq("av"))
    assert(one.count() == 500)
  }
}
