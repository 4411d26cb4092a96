package graft.pol

import org.apache.spark.sql.SparkSession

/** CLI batch entry point — the analog of the reference's
  * `python etl/main.py --all` (`etl/main.py:154-165`): scan → parse →
  * metrics → documents → summary, printed/written from one Spark job.
  *
  * Usage: PolMain <pol-root> [lookup-csv] [out-dir]
  */
object PolMain {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/root/reference/samples/pools2")
    val lookupCsv = args.lift(1)
      .getOrElse("src/test/resources/lookup/game_lookup.csv")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pol")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = GameLookup.fromCsv(spark, lookupCsv)
    val parsed = PolParser.read(spark, root)
    val pools = PoolMetrics.perPool(parsed, dim)
    val docs = PoolMetrics.documents(pools)

    docs.select("pool_name", "pool_id", "pool_type", "min_bet", "rtp",
        "volatility", "size", "tag", "is_flat", "max_multiplier")
      .orderBy("pool_name")
      .show(50, truncate = false)
    PoolSummary.aggregate(docs).show(truncate = false)

    args.lift(2).foreach { out =>
      docs.write.mode("overwrite").json(s"$out/pool_documents")
    }
    spark.stop()
  }
}
