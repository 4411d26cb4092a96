package graft.relational

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.QueryHarness.spark

class SkewSpec extends AnyFunSuite {
  import spark.implicits._

  // 90% of rows share one key — the shape that hot-spots a reducer
  lazy val skewed = (1 to 10000).map { i =>
    (if (i % 10 == 0) s"key_${i % 7}" else "hot_key", i.toLong, i * 2.5)
  }.toDF("k", "v", "w")

  test("salted aggregation equals plain aggregation on skewed data") {
    val plain = skewed.groupBy("k")
      .agg(sum($"v").as("sv"), count($"v").as("cv"),
        min($"w").as("mn"), max($"w").as("mx"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAggregate(
      skewed, Seq("k"),
      Map("sv" -> (col("v"), "sum"), "cv" -> (col("v"), "count"),
        "mn" -> (col("w"), "min"), "mx" -> (col("w"), "max")),
      buckets = 8)
      .orderBy("k").collect().toSeq
    assert(salted.map(_.toSeq) == plain.map(_.toSeq))
  }

  test("salted join equals plain join on skewed fact") {
    val dim = (0 to 6).map(i => (s"key_$i", s"name_$i"))
      .toDF("k", "name").union(Seq(("hot_key", "hot")).toDF("k", "name"))
    val plain = skewed.join(dim, Seq("k"))
      .groupBy("k", "name").agg(sum($"v").as("sv"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k", buckets = 8)
      .groupBy("k", "name").agg(sum($"v").as("sv"))
      .orderBy("k").collect().toSeq
    assert(salted.map(_.toSeq) == plain.map(_.toSeq))
  }

  test("left join preserves unmatched fact rows through salting") {
    val dim = Seq(("key_1", "one")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k"), "left").count()
    val salted = Skew.saltedJoin(skewed, dim, "k", 4, "left").count()
    assert(salted == plain)
  }

  test("non-algebraic aggregate is rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedAggregate(skewed, Seq("k"),
        Map("bad" -> (col("v"), "median")))
    }
  }
}
