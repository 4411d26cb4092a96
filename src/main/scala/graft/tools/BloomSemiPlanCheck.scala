package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off plan check: with the candidate-broadcast cap forced to 1,
  * print d8's physical plan to confirm the bloom might_contain
  * predicate lands ON the documents scan (below the shingle
  * projection), not above it. `BloomSemiPlanCheck [sfDir]`
  */
object BloomSemiPlanCheck {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.dedup.cand_broadcast_cap", "1")
    val plan = graft.SparkEntry.queries("d8_jaccard_verify")(spark, d)
      .queryExecution.executedPlan
    println(plan.toString.take(12000))
    spark.stop()
  }
}
