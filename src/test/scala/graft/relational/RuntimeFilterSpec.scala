package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** At 100 TB the fact-side scan dominates every selective dim-fact
  * join, and Spark's runtime bloom-filter injection is what prunes it:
  * the dim side's filtered keys become a bloom filter applied at the
  * fact scan, cutting shuffle input before the join. The thresholds
  * default to cluster scale (10 GB application side), so this spec
  * lowers them to prove the catalog's join shapes are eligible — the
  * same plans get the filter for free on a real cluster.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  import graft.QueryHarness._

  test("selective dim-fact join is eligible for runtime bloom filter") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = graft.Tables.lineitem(spark, sf001)
      val p = graft.Tables.part(spark, sf001)
        .where(col("p_retailprice") > 1900)
      val j = li.join(p, li("l_partkey") === p("p_partkey"))
        .groupBy().count()
      val opt = j.queryExecution.optimizedPlan.toString.toLowerCase
      assert(opt.contains("bloom"),
        s"no bloom filter injected; optimized plan:\n$opt")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
