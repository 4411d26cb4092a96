package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall/cost curve for the LSH hot-bucket cap, computed WITHOUT the
  * pair join: `OccCurveProbe <corpusDir> [cap ...]`.
  *
  * From one banded pass: (1) the rows-weighted width histogram →
  * implied candidate-pair cost Σ C(w,2)·n_b(w) for kept buckets at
  * each cap (the d7 self-join's exact output size — the cost axis);
  * (2) each PLANTED pair's min shared-bucket width (bucket-array
  * intersection of doc 50k vs 50k+1, width lookup, min) → planted
  * recall at each cap in one shot (a pair survives a cap iff its
  * narrowest shared bucket is under it — the recall axis). This is
  * the measured basis for the cap recommendation formula: the 99%-of-
  * rows rule is recall-correct but cost-blind; the curve shows where
  * the quadratic cost actually sits on this corpus shape.
  */
object OccCurveProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    // flags anywhere after the dir: r=<rowsPerBand> (default 4),
    // k=<numPerms> (default 16 — round-11's third lever)
    val rArg = args.find(_.startsWith("r="))
      .map(_.stripPrefix("r=").toInt)
    val kArg = args.find(_.startsWith("k="))
      .map(_.stripPrefix("k=").toInt)
    val capArgs = args.drop(1)
      .filterNot(a => a.startsWith("r=") || a.startsWith("k="))
    val caps: Seq[Long] =
      if (capArgs.nonEmpty) capArgs.toSeq.map(_.toLong)
      else Seq(2L, 8L, 32L, 128L, 512L, 2048L, 8192L, 32768L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    kArg.foreach(k => spark.conf.set("graft.dedup.num_perms", k))

    val bs = graft.llm.DedupQueries
      .sigsWithBuckets(spark, d, rArg.getOrElse(4))
      .localCheckpoint()
    val widths = bs.select(explode(col("bs")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("w"))
    val hist = widths.groupBy("w").agg(count(lit(1)).as("nb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = hist.map { case (w, nb) => w * nb }.sum

    // planted pairs: min shared-bucket width per pair
    val a = bs.where(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("bs").as("ba"))
    val b = bs.where(col("doc_id") % 50 === 1)
      .select((col("doc_id") - 1).as("doc_id"), col("bs").as("bb"))
    val minw = a.join(b, "doc_id")
      .select(col("doc_id"),
        explode(array_intersect(col("ba"), col("bb"))).as("bucket"))
      .join(widths.hint("shuffle_hash"), "bucket")
      .groupBy("doc_id").agg(min(col("w")).as("minw"))
      .select("minw").as(spark.implicits.newLongEncoder).collect().sorted
    val planted = bs.where(col("doc_id") % 50 === 0).count()
      .min(bs.where(col("doc_id") % 50 === 1).count())

    println(s"corpus=$d rows_per_band=${rArg.getOrElse(4)} " +
      s"num_perms=${kArg.getOrElse(16)} " +
      s"planted_pairs=$planted " +
      s"pairs_sharing_any_bucket=${minw.length} total_banded_rows=$total")
    caps.foreach { c =>
      val keptRows = hist.collect { case (w, nb) if w <= c => w * nb }.sum
      val pairs = hist.collect {
        case (w, nb) if w <= c => w * (w - 1) / 2 * nb
      }.sum
      val recall = minw.count(_ <= c).toDouble / math.max(planted, 1L)
      println(f"cap=$c%-7d kept_rows=${keptRows.toDouble / total}%.4f " +
        f"implied_pairs=$pairs%-12d planted_recall=$recall%.4f")
    }
    spark.stop()
  }
}
