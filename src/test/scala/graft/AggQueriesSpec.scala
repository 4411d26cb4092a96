package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class AggQueriesSpec extends AnyFunSuite {
  import QueryHarness._

  test("every agg query runs and returns rows at sf0.001") {
    relational.AggQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query key has matching columns present in the result") {
    // oracle compare sorts columns by name — here we just pin that each
    // query is deterministic across two runs (stable ORDER BY contract)
    relational.AggQueries.queries.foreach { case (name, fn) =>
      val a = fn(spark, sf0001).collect().toSeq
      val b = fn(spark, sf0001).collect().toSeq
      assert(a == b, s"$name not deterministic across runs")
    }
  }

  test("a1_count total equals lineitem row count") {
    val total = relational.AggQueries.queries("a1_count")(spark, sf0001)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(total == Tables.lineitem(spark, sf0001).count())
  }

  test("a6_volatility values are non-negative and rounded to 2dp") {
    val rows = relational.AggQueries.queries("a6_volatility")(spark, sf0001).collect()
    rows.foreach { r =>
      val v = r.getAs[Double]("volatility")
      assert(v >= 0)
      assert(math.abs(v * 100 - math.rint(v * 100)) < 1e-9, s"not 2dp: $v")
    }
  }

  test("a4 hit frequency bounded 0..100") {
    relational.AggQueries.queries("a4_hit_frequency")(spark, sf0001).collect()
      .foreach { r =>
        val h = r.getAs[Double]("hit_freq")
        assert(h >= 0 && h <= 100)
      }
  }
}
