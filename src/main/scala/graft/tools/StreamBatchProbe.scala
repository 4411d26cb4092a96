package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Round-13 streaming-floor decomposition (verdict item 5):
  * `StreamBatchProbe <sfDir> [query ...]` runs the named t-queries
  * and prints every micro-batch's durationMs breakdown
  * (triggerExecution / queryPlanning / getBatch / addBatch /
  * walCommit / commitOffsets / getEndOffset ...) from the
  * StreamingQueryProgress events, so the per-stream fixed floor is
  * attributable to a phase instead of a guess.
  */
object StreamBatchProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val qs = if (args.length > 1) args.drop(1).toSeq
      else Seq("t1_stream_agg", "t6_stream_upsert")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[stream] started ${e.name} at ${System.nanoTime() / 1e9}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dm = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[batch] ${p.name} batch=${p.batchId} rows=${p.numInputRows} $dm")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[stream] terminated at ${System.nanoTime() / 1e9}")
    }
    spark.streams.addListener(listener)

    qs.foreach { q =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        graft.Bench.force(graft.SparkEntry.queries(q)(spark, d))
        println(f"== $q rep$rep total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
