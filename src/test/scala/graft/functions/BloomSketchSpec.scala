package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bloom-sketch wrapper's contract: zero false negatives (the
  * property the x9 exact-verify chain depends on), a usefully low
  * false-positive rate at the chosen sizing, and x9's end-to-end
  * equality with x8's unsketched plan on real testdata.
  */
class BloomSketchSpec extends AnyFunSuite {
  import graft.QueryHarness._

  private def buildSketch(keys: Seq[Long]): Array[Byte] = {
    import spark.implicits._
    keys.toDF("k")
      .agg(BloomSketch.build(col("k"), 1L << 20).as("bf"))
      .head.getAs[Array[Byte]]("bf")
  }

  test("no false negatives: every inserted key might-contains true") {
    import spark.implicits._
    val keys = (0L until 5000L).map(i => i * 2654435761L + 17)
    val sketch = buildSketch(keys)
    val misses = keys.toDF("k")
      .where(!BloomSketch.mightContain(sketch, col("k")))
      .count()
    assert(misses == 0L)
  }

  test("false-positive rate is bounded at the sized capacity") {
    import spark.implicits._
    val members = (0L until 5000L).map(i => i * 2654435761L + 17)
    val sketch = buildSketch(members)
    // disjoint probe population (odd offsets can collide only by hash)
    val probes = (1L to 20000L).map(i => -i * 1099511628211L)
    val fp = probes.toDF("k")
      .where(BloomSketch.mightContain(sketch, col("k")))
      .count()
    // sized for 2^20 items holding 5k — fp rate should be far under 1%
    assert(fp < 200L, s"$fp false positives out of ${probes.size}")
  }

  test("x9 bloom-prefiltered plan equals x8's exact plan on testdata") {
    val x8 = graft.SparkEntry.queries("x8_decontaminate")(spark, sf0001)
      .collect().map(_.toString).toSeq
    val x9 = graft.SparkEntry.queries("x9_decontaminate_bloom")(spark, sf0001)
      .collect().map(_.toString).toSeq
    assert(x9 == x8)
  }
}
