package graft.tools

import org.apache.spark.sql.SparkSession

/** Streaming-family bench floor (round-10 verdict item 6): how much
  * of a t-query's bench row is per-query FIXED cost (stream start,
  * state-store + checkpoint init, micro-batch scheduling) vs actual
  * work? `StreamFloorProbe <sfDir> [reps]` runs a spread of t-queries
  * back-to-back in ONE JVM, several reps each — every rep builds a
  * FRESH checkpoint/scratch dir (the queries scratch per invocation),
  * so rep deltas isolate JIT/class-load, and the steady rep minus the
  * query's batch-equivalent cost is the streaming floor. t1 (one
  * stateful agg over the events stream) is the floor yardstick: its
  * batch equivalent is a sub-100ms group-by, so its steady rep IS
  * ~the floor for a single-sink stream; t6/t13 add genuine per-batch
  * MERGE/serving work on top.
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = Seq("t1_stream_agg", "t5_stream_dedup", "t6_stream_upsert",
      "t13_stream_crossmodal_serving")
    qs.foreach { q =>
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.force(graft.SparkEntry.queries(q)(spark, d))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$q: ${times.map(t => f"$t%.2f").mkString(" ")} " +
        f"(steady=${times.drop(1).min}%.2f)")
    }
    spark.stop()
  }
}
