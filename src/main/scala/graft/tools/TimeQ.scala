package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query timer: `TimeQ <sfDir> <reps> <query ...>` runs each named
  * catalog query `reps` times and prints per-rep wall seconds — used to
  * separate steady-state cost from first-run (codegen/JIT) cost while
  * optimizing the bench hotspots.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CONF="k=v,k2=v2" — session confs for dial sweeps.
    // Entries without '=' (or a trailing comma) fail with a clear
    // message instead of an opaque MatchError (round-12 advice).
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(',')
      .map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k.trim, v.trim)
          case _ => sys.error(
            s"SPARK_GRAFT_CONF entry '$kv' is not of the form k=v")
        }
      })
    names.foreach { q =>
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.force(graft.SparkEntry.queries(q)(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$q: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
