package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 A/B of the d4/d13 exact pair stage (verdict items 1+3):
  * `PairShapeProbe <corpusDir> [reps]`, interleaved so host drift
  * cancels across shapes.
  *
  * A  = shipped round-12 shape: per-doc set size `n` rides the
  *      explode on BOTH self-join sides, pair aggregate groups on
  *      (doc_a, doc_b, na, nb);
  * M  = same join, 2-key aggregate: group on (doc_a, doc_b), recover
  *      na/nb as min() aggregates (functionally dependent on the doc
  *      ids, so identical values — cheaper grouping hash, same rows);
  * W  = singleton pre-filter via WINDOW: count(*) over (partition by
  *      source, h) on the exploded relation, keep c >= 2, then the A
  *      join — the window reuses the join's own hash(source, h)
  *      exchange (a sort, NOT a third shuffle), and a hash occurring
  *      in one doc can never produce a pair row, so the join's build
  *      relation shrinks to co-occurring shingles only;
  * S  = singleton pre-filter via COUNT+SEMI: groupBy(source, h)
  *      count >= 2, left-semi back onto the exploded relation (the
  *      "third shuffle" variant the round-12 notes predicted).
  *
  * All shapes must produce identical (doc_a, doc_b, na, nb, shared)
  * relations — checked by count + order-independent xor hash before
  * timing.
  */
object PairShapeProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
    val narrow = docs.groupBy("source")
      .agg(count(lit(1)).as("w"))
      .where(col("w") <= 1000)
      .select("source")
    val capped = docs.join(broadcast(narrow), "source")
      .select(col("doc_id"), col("source"),
        graft.functions.ShingleHashes(col("text")).as("hs"))
    def sh = capped
      .select(col("doc_id"), col("source"), size(col("hs")).as("n"),
        explode(col("hs")).as("h"))

    def pairJoin(rel: DataFrame): DataFrame =
      rel.as("a").hint("shuffle_hash")
        .join(rel.as("b").hint("shuffle_hash"),
          col("a.source") === col("b.source") && col("a.h") === col("b.h") &&
            col("a.doc_id") < col("b.doc_id"))

    def shapeA: DataFrame =
      pairJoin(sh)
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("shared"))

    def shapeM: DataFrame =
      pairJoin(sh)
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(min(col("a.n")).as("na"), min(col("b.n")).as("nb"),
          count(lit(1)).as("shared"))
        .select("doc_a", "doc_b", "na", "nb", "shared")

    def shapeW: DataFrame = {
      val filtered = sh
        .withColumn("c",
          count(lit(1)).over(Window.partitionBy("source", "h")))
        .where(col("c") >= 2).drop("c")
      pairJoin(filtered)
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("shared"))
    }

    def shapeS: DataFrame = {
      val co = sh.groupBy("source", "h")
        .agg(count(lit(1)).as("c")).where(col("c") >= 2)
        .select("source", "h")
      val filtered = sh.hint("shuffle_hash")
        .join(co.hint("shuffle_hash"), Seq("source", "h"), "left_semi")
      pairJoin(filtered)
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("shared"))
    }

    val shapes = Seq(
      "A shipped" -> (() => shapeA),
      "M 2key-agg" -> (() => shapeM),
      "W window-filter" -> (() => shapeW),
      "S count-semi" -> (() => shapeS))

    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(
        col("doc_a"), col("doc_b"), col("na"), col("nb"), col("shared"))))
        .first()
      (r.getLong(0),
        Option(r.getAs[java.lang.Long](1)).map(_.longValue).getOrElse(0L))
    }
    val sigs = shapes.map { case (nm, f) => nm -> sig(f()) }
    sigs.foreach { case (nm, s) => println(s"$nm sig=$s") }
    println("all equal = " + (sigs.map(_._2).distinct.size == 1))

    (1 to reps).foreach { i =>
      shapes.foreach { case (nm, f) =>
        val t0 = System.nanoTime()
        force(f())
        println(f"$nm%-18s rep$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}
