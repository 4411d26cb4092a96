package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone check of the production wiring: a FRESH JVM session built
  * with `spark.sql.extensions=graft.GraftExtensions` must resolve the
  * native SQL functions and plan the custom as-of join — the static
  * conf only applies at SparkContext creation, so this cannot run
  * inside the shared-context test suite.
  */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-check")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val r = s.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  pol_line_parse('5 TB1').game_win AS win""".stripMargin).collect()(0)
    import s.implicits._
    val left = Seq((1L, 20L, 200L)).toDF("k", "t", "lv")
    val right = Seq((1L, 15L, 7L)).toDF("rk", "rt", "payload")
    val asof = graft.plans.AsOf.join(left, right, "k", "rk", "t", "rt")
    val planned = asof.queryExecution.executedPlan.toString.contains("AsOfJoin ")
    val joined = asof.select("payload").collect()(0).getLong(0)
    println(s"""{"dp":${r.getDouble(0)},"win":${r.getLong(1)},""" +
      s""""asof_planned":$planned,"asof_value":$joined}""")
    s.stop()
    assert(r.getDouble(0) == 11.0 && r.getLong(1) == 5L && planned && joined == 7L)
  }
}
