package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.spark

/** The native TypedImperativeAggregate must be indistinguishable from
  * the udaf Aggregator it replaces on n5's hot path: same ranking
  * (score desc, id asc ties), same results under any partitioning
  * (partial merge invisibility), and correct under serialize/
  * deserialize round-trips (Spark exercises those between partial and
  * final aggregation).
  */
class NativeTopKSpec extends AnyFunSuite {
  import spark.implicits._

  private var state = 99L
  private def next(mod: Int): Int = {
    state = state * 6364136223846793005L + 1442695040888963407L
    Math.floorMod(state >>> 11, mod.toLong).toInt
  }

  test("native == udaf Aggregator on duplicate-heavy random data") {
    (1 to 5).foreach { trial =>
      val rows = (0 until 500 + next(500)).map { i =>
        // few groups, coarse scores -> dense score ties exercise the
        // (score desc, id) tiebreak
        (next(7).toLong, next(20) / 10.0, i.toLong)
      }
      val df = rows.toDF("g", "score", "id")
        .repartition(1 + next(7))
      val native = df.groupBy("g")
        .agg(NativeTopK.topNeighbors(5, col("score"), col("id")).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), col("pos"), col("col.id"), col("col.score"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
      val udafTopk = TopKAgg.topNeighbors(5)
      val viaUdaf = df.groupBy("g")
        .agg(udafTopk(col("score"), col("id")).as("top"))
        .select(col("g"), posexplode(col("top.items")))
        .select(col("g"), col("pos"), col("col.id"), col("col.score"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(native == viaUdaf, s"trial $trial")
    }
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val agg = TopKByScoreAgg(
      org.apache.spark.sql.GraftColumnBridge.expression(lit(0)),
      org.apache.spark.sql.GraftColumnBridge.expression(lit(0L)), 5)
    val buf = scala.collection.mutable.ArrayBuffer(
      (0.9, 3L), (0.9, 1L), (-0.2, 7L), (1.0, 99L))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
    // and an empty buffer survives too
    assert(agg.deserialize(agg.serialize(
      agg.createAggregationBuffer())).isEmpty)
  }

  test("fewer than k inputs returns all, ranked") {
    val df = Seq((1L, 0.5, 10L), (1L, 0.9, 4L), (1L, 0.5, 2L))
      .toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(NativeTopK.topNeighbors(5, col("score"), col("id")).as("top"))
      .select(explode(col("top")))
      .select(col("col.id")).as[Long].collect().toSeq
    assert(got == Seq(4L, 2L, 10L))
  }
}
