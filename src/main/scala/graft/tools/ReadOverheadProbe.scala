package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolates the per-construction cost of `spark.read.parquet` —
  * `ReadOverheadProbe <sfDir> [n]`. Every catalog query constructs
  * its input relations through Tables.load, which re-infers the
  * schema (footer read + file listing) per call; at 160 queries ×
  * 1–4 relations each, a per-call overhead of even 20 ms is seconds
  * of catalog total. Times n constructions (analysis forced via
  * .schema) of the documents and lineitem relations, with and
  * without a pre-supplied schema, plus one full count() for scale.
  */
object ReadOverheadProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val n = if (args.length > 1) args(1).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-38s ${(System.nanoTime() - t0) / 1e9 / n * 1000}%8.2f ms/call")
    }

    Seq("documents", "lineitem").foreach { tbl =>
      val path = s"$d/$tbl.parquet"
      // warm the JVM + any shared caches once
      spark.read.parquet(path).schema
      time(s"$tbl infer-schema construct") {
        (1 to n).foreach(_ => spark.read.parquet(path).schema)
      }
      val sch = spark.read.parquet(path).schema
      time(s"$tbl supplied-schema construct") {
        (1 to n).foreach(_ => spark.read.schema(sch).parquet(path).schema)
      }
      // planning included: resolve + physical plan, no execution
      time(s"$tbl infer + physical plan") {
        (1 to n).foreach(_ =>
          spark.read.parquet(path).groupBy().count()
            .queryExecution.executedPlan)
      }
    }
    spark.stop()
  }
}
