package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures candidate "merged coarse cells" detectors on the three
  * corpus shapes the recall work used (diffuse probe / clustered
  * probe / testdata), to ground the serving-time recall advisory's
  * threshold in data instead of guesswork:
  * per trained cell — min member cos (δ_c, n13's harvested stat),
  * AVG member cos, and the max cos to any OTHER centroid (how close
  * the nearest neighboring cell sits).
  *
  * `ClusterStatProbe <nVecs> <workDir>` (reuses PqRecallProbe's
  * generators).
  */
object ClusterStatProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = args(0).toLong
    val workDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Seq(("diffuse", false), ("clustered", true)).foreach {
      case (shape, clustered) =>
        val dir = s"$workDir/$shape"
        graft.tools.ProbeCorpora.write(spark, nVecs, dir, clustered)
        report(spark, shape, dir)
    }
    report(spark, "testdata-sf0.01", "/root/testdata/sf0.01")
    spark.stop()
  }

  def report(spark: SparkSession, shape: String, dir: String): Unit = {
    val stats = graft.llm.SimilarityQueries.clusterShapeStats(spark, dir)
    println(s"== $shape ==")
    stats.toSeq.sortBy(_._1).foreach { case (cid, st) =>
      println(f"cid=$cid%-4d minCos=${st.minCos}%7.3f avgCos=${st.avgCos}%7.3f " +
        f"stdCos=${st.stdCos}%7.3f maxOtherCentroidCos=${st.maxOtherCos}%7.3f")
    }
    val adv = graft.llm.SimilarityQueries.mergedClusterFraction(spark, dir)
    println(f"merged-cell fraction: $adv%.2f")
  }
}
