package graft.relational

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.QueryHarness.{spark, sf001}

/** The approximate variants the 100 TB path substitutes for exact
  * operators (SURVEY §2 O4 note, SCALING.md): HLL distinct counts and
  * quantile sketches. Pinned against their exact counterparts with the
  * tolerance the substitution contract promises.
  */
class ApproxSpec extends AnyFunSuite {

  test("approx_count_distinct within 5% of exact") {
    val li = graft.Tables.lineitem(spark, sf001)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect()(0)
    val exact = r.getAs[Long]("exact").toDouble
    val approx = r.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("percentile_approx brackets the exact median") {
    val li = graft.Tables.lineitem(spark, sf001)
    val r = li.agg(
      median(col("l_extendedprice")).as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
        .as("approx"))
      .collect()(0)
    val exact = r.getAs[Double]("exact")
    val approx = r.getAs[Double]("approx")
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx $approx vs exact $exact")
  }
}
