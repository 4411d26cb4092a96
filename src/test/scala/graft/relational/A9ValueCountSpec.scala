package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.spark

/** Round-13: a9_rich_stats derives median/stddev/distinct from a
  * (flag, value, count) table instead of buffering every group row
  * in a Percentile aggregate. This spec pins the reconstruction
  * against Spark's OWN direct aggregate (the round-12 formulation)
  * on a synthetic table engineered for the edge cases the rewrite
  * must reproduce: odd and even group sizes (Percentile's 0.5
  * interpolation averages two middle values on even n), duplicated
  * values, groups with mixed nulls, and a group with only nulls.
  * Values are multiples of 0.25, so every weighted sum is exact in
  * binary and the comparison is bitwise, not approximate.
  */
class A9ValueCountSpec extends AnyFunSuite {

  private def synthetic(): String = {
    import spark.implicits._
    val rows = Seq.newBuilder[(String, java.lang.Double)]
    // group "odd": 7 rows with duplicates -> median is an exact value
    Seq(1.0, 2.0, 2.0, 3.25, 4.0, 4.0, 50.0).foreach(v =>
      rows += (("odd", v)))
    // group "even": 8 rows -> median averages two middle values
    Seq(0.25, 1.0, 1.5, 2.0, 3.0, 3.0, 4.75, 9.0).foreach(v =>
      rows += (("even", v)))
    // group "nulls": values interleaved with nulls (median and
    // n_distinct skip them; n counts them)
    Seq[java.lang.Double](5.0, null, 7.25, null, 7.25, 8.0).foreach(v =>
      rows += (("nulls", v)))
    // group "allnull": no non-null value at all
    Seq[java.lang.Double](null, null, null).foreach(v =>
      rows += (("allnull", v)))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_a9spec").toString
    rows.result().toDF("l_returnflag", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("value-count a9 equals the direct median/stddev/distinct " +
      "aggregate bitwise on odd/even/null/all-null groups") {
    val dir = synthetic()
    val got = graft.SparkEntry.queries("a9_rich_stats")(spark, dir)
    // the round-12 direct formulation, verbatim
    val want = graft.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag").as("type_code"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_v"),
        min(col("l_quantity")).as("min_v"),
        max(col("l_quantity")).as("max_v"),
        round(sum(col("l_quantity")) / count(lit(1)), 4).as("avg_v"),
        median(col("l_quantity")).as("median_v"),
        round(sqrt(
          (sum(col("l_quantity") * col("l_quantity")) -
            sum(col("l_quantity")) * sum(col("l_quantity")) /
              count(lit(1))) /
            (count(lit(1)) - 1)), 4).as("stddev_v"),
        countDistinct(col("l_quantity")).as("n_distinct"))
      .orderBy("type_code")
    assert(got.schema == want.schema)
    assert(got.collect().toSeq == want.collect().toSeq)
  }
}
