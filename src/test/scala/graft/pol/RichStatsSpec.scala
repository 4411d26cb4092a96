package graft.pol

import org.scalatest.funsuite.AnyFunSuite
import graft.QueryHarness.spark
import org.apache.spark.sql.functions._

class RichStatsSpec extends AnyFunSuite {
  lazy val parsed = PolParser.read(spark, "src/test/resources/pol/malformed.pol")

  test("per-file summary stats") {
    val r = RichStats.perFile(parsed).collect().head
    // values: 5, 10, 9, -4, 20, 0
    assert(r.getAs[Long]("total_values") == 6)
    assert(r.getAs[Long]("sum") == 40)
    assert(r.getAs[Long]("min") == -4)
    assert(r.getAs[Long]("max") == 20)
    assert(r.getAs[Double]("avg") == 6.67)
    assert(r.getAs[Double]("median") == 7.0)
    assert(r.getAs[Long]("unique_types") == 4) // TB1 TB2 TF1 TB3 (null excluded)
  }

  test("per-type breakdown with percentages") {
    val m = RichStats.perType(parsed).collect()
      .map(r => Option(r.getAs[String]("type_code")) ->
        ((r.getAs[Long]("count"), r.getAs[Double]("pct")))).toMap
    assert(m(Some("TB1")) == ((2L, 33.33)))
    assert(m(None) == ((1L, 16.67))) // the bare "0" line
  }

  test("histogram buckets") {
    val h = RichStats.histogram(parsed, 10).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("count")).toMap
    assert(h(0L) == 3) // 5, 9, 0
    assert(h(10L) == 1)
    assert(h(20L) == 1)
    assert(h(-10L) == 1) // -4
  }

  test("first/last samples keep file line order") {
    val s = RichStats.samples(RichStats.withLineNumbers(parsed), 2).collect()
    val first = s.filter(_.getAs[String]("which") == "first")
      .map(_.getAs[Long]("game_win")).toSeq
    assert(first == Seq(5L, 10L))
    val last = s.filter(_.getAs[String]("which") == "last")
      .map(_.getAs[Long]("game_win")).toSeq
    assert(last == Seq(20L, 0L))
  }
}
