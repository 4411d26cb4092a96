package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Column API over Spark's own bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `InjectRuntimeFilter`'s row-group filters, exposed here for
  * explicit use in a decontamination pass).
  *
  * The intended shape: fold the SMALL side's join keys into a sketch
  * with [[build]] (distributed aggregation — each task feeds its
  * partition, partials OR together), ship the resulting few-hundred-KB
  * binary to the driver, and inline it with [[mightContain]] as a
  * constant predicate on the LARGE side — a map-only prefilter that
  * runs inside whole-stage codegen with no join and no shuffle,
  * exactly how Spark's runtime filters ship their sketches. False
  * positives (rate set by `expectedItems`) must be removed by an exact
  * verify stage downstream when exact results are required.
  */
object BloomSketch {

  /** Aggregate a `bigint` column into a bloom-filter sketch (binary).
    * `expectedItems` sizes the filter at Spark's default FPP.
    *
    * Spark CLAMPS the aggregate at the runtime-filter confs
    * (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems` = 4M,
    * `.maxNumBits` = 64M bits) — sized for per-join runtime filters,
    * not an explicit history sketch. A caller asking for 10M+ items
    * would silently get a saturating filter (measured fp 11% at 10M
    * keys under the default caps), which is exactly the
    * degraded-prefilter failure mode sizing-from-count exists to
    * prevent — so the confs are raised here to fit the request. The
    * session-conf write is visible side state, documented and
    * monotonic (only ever raised).
    */
  def build(keys: Column, expectedItems: Long): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession.foreach { s =>
      val needBits = org.apache.spark.util.sketch.BloomFilter
        .optimalNumOfBits(expectedItems, 0.03)
      val itemsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
      val bitsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
      if (s.conf.get(itemsConf).toLong < expectedItems)
        s.conf.set(itemsConf, expectedItems)
      if (s.conf.get(bitsConf).toLong < needBits)
        s.conf.set(bitsConf, needBits)
    }
    GraftColumnBridge.column(
      new BloomFilterAggregate(GraftColumnBridge.expression(keys),
        expectedItems).toAggregateExpression())
  }

  /** Constant-sketch membership probe: `might_contain(sketch, key)`.
    * False positives possible, false negatives never — callers needing
    * exact semantics verify survivors against the exact key set.
    */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      GraftColumnBridge.expression(key)))
}
