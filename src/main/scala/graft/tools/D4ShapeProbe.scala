package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures two shapes of the d4/d13 exact pair stage at sf scale:
  * `D4ShapeProbe <corpusDir> [reps]`.
  *
  * A = the shipped co-occurrence SELF-JOIN (sh ⋈ sh on (source, h),
  *     doc_a < doc_b, then the pair aggregate);
  * B = GROUPED expansion: one shuffle to (source, h), collect the
  *     (doc_id, n) list per shingle hash, drop singleton lists (a
  *     hash seen in one doc can never produce a pair row), expand
  *     the in-group pairs with two Generates, then the same pair
  *     aggregate.
  *
  * Both produce identical (doc_a, doc_b, na, nb, shared) relations
  * (the probe checks count + xor-hash equality); the question is
  * which plan is cheaper — the join reads the exchanged relation
  * twice and probes a hash relation per row, the grouped shape pays
  * one exchange plus an ObjectHashAggregate and explodes c² rows per
  * group. Group width is bounded by the block cap, so the expansion
  * cannot blow up beyond cap² per hash.
  */
object D4ShapeProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
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
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // the shipped scaffold, reproduced up to the exploded relation
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

    def shapeA: DataFrame =
      sh.as("a").hint("shuffle_hash")
        .join(sh.as("b").hint("shuffle_hash"),
          col("a.source") === col("b.source") && col("a.h") === col("b.h") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("shared"))

    def shapeB: DataFrame =
      sh.groupBy(col("source"), col("h"))
        .agg(collect_list(struct(col("doc_id"), col("n"))).as("ds"))
        .where(size(col("ds")) >= 2)
        .select(explode(col("ds")).as("a"), col("ds"))
        .select(col("a"), explode(col("ds")).as("b"))
        .where(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("shared"))

    // warmup + value equality (count, order-independent xor hash)
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(
        col("doc_a"), col("doc_b"), col("na"), col("nb"), col("shared"))))
        .first()
      (r.getLong(0),
        Option(r.getAs[java.lang.Long](1)).map(_.longValue).getOrElse(0L))
    }
    val (ca, xa) = sig(shapeA)
    val (cb, xb) = sig(shapeB)
    println(s"A rows=$ca xor=$xa")
    println(s"B rows=$cb xor=$xb  equal=${(ca, xa) == (cb, xb)}")

    (1 to reps).foreach { i =>
      t(s"A self-join    rep$i") { force(shapeA) }
      t(s"B grouped      rep$i") { force(shapeB) }
    }
    spark.stop()
  }
}
