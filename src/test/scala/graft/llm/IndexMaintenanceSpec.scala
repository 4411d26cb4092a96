package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** n18's contracts beyond the oracle row: the engine-side maintenance
  * invariant (incrementally-maintained table ≡ frozen-model full
  * rebuild minus tombstoned keys), and the staleness advisory — fires
  * on an out-of-distribution delta (frozen codebooks cannot represent
  * the residuals → reconstruction error blows past the baseline),
  * silent on an in-distribution delta.
  */
class IndexMaintenanceSpec extends AnyFunSuite {
  import graft.QueryHarness._

  test("incremental maintenance equals frozen-model rebuild minus deletes") {
    val maintained = graft.SparkEntry
      .queries("n18_index_maintenance")(spark, sf0001)
      .collect().toSeq
    val rebuilt = SimilarityQueries.pqEncode(spark, sf0001,
        graft.Tables.embeddings(spark, sf0001)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("e")))
      .where(col("vec_id") % 13 =!= 0)
      .orderBy("vec_id")
      .collect().toSeq
    assert(maintained.nonEmpty)
    assert(maintained == rebuilt)
  }

  /** A small in-distribution corpus: hash-seeded unit-range floats. */
  private def fixtureCorpus(n: Int): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_n18_fix_").toString
    import spark.implicits._
    (0 until n).map { i =>
      val rnd = new scala.util.Random(i * 7919 + 13)
      (i.toLong, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat),
        i % 8)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("staleness advisory fires on an out-of-distribution delta") {
    val dir = fixtureCorpus(48)
    import spark.implicits._
    // a drifted modality: 30× the training magnitude — residuals the
    // frozen unit-range codebooks cannot represent
    val shifted = (1000 until 1016).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Array.fill(64)(30.0 * (rnd.nextDouble() * 2 - 1)))
    }.toDF("vec_id", "e")
    assert(SimilarityQueries.maybeWarnIndexStaleness(spark, dir, shifted))
  }

  test("staleness advisory is silent on an in-distribution delta") {
    // n18's own second insert batch over the testdata corpus: encoded
    // by the model that was trained on (a superset of) it — ratio ~1
    val delta = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .where(col("vec_id") % 10 === 9)
    assert(!SimilarityQueries.maybeWarnIndexStaleness(spark, sf0001, delta))
    assert(SimilarityQueries.pqBaseErr(spark, sf0001) > 0)
  }
}
