package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch: dump executedPlan treeString with AQE off. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, args(0))
        .queryExecution.executedPlan.treeString.linesIterator.take(14).mkString("\n"))
    }
    spark.stop()
  }
}
