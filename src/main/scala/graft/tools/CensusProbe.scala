package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints all three families' occupancy censuses for a corpus dir:
  * `CensusProbe <dir>` — the calibration data for each advisory's
  * warn threshold (healthy-corpus shed fraction vs the saturated
  * fixtures').
  */
object CensusProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def p(name: String, o: graft.llm.LshCensus.Occupancy): Unit =
      println(f"$name%-6s shed=${o.shedFraction}%.4f rows=${o.totalRows} " +
        s"buckets=${o.nBuckets} overCap=${o.nOverCap} " +
        s"maxW=${o.maxWidth} capRec=${o.capRec}")
    p("dedup", graft.llm.DedupQueries.lshOccupancy(spark, d))
    p("emb", graft.llm.SimilarityQueries.embOccupancy(spark, d))
    p("phash", graft.llm.MultimodalQueries.phashOccupancy(spark, d))
    spark.stop()
  }
}
