package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspector: `Explain [sfDir] [query ...]` prints the formatted
  * physical plan of the named catalog queries (all queries if none
  * given). Used to keep pushdown / broadcast / codegen properties
  * under review as the catalog evolves.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      println(s"===== $q =====")
      try graft.SparkEntry.queries(q)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
