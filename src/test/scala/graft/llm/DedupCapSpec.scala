package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Pins that d4's block cap actually binds: on a skewed corpus (one
  * source far wider than the cap) the fat source contributes no pairs
  * — its quadratic self-join never runs — while identical near-dups
  * in a narrow source still surface. This is the guard the r2 verdict
  * asked for: without the cap, one dominant crawl at 100 TB turns the
  * exact baseline into an all-pairs explosion.
  */
class DedupCapSpec extends AnyFunSuite {
  import graft.QueryHarness._

  private def corpus(dir: String): Unit = {
    import spark.implicits._
    // fat source: 40 docs, every one a near-dup of its neighbor
    // (shared 8-gram runs) — over any cap < 40
    val fat = (0L until 40L).map { i =>
      (i, s"the quick brown fox jumps over the lazy dog number $i end",
        "en", "fat", 50L)
    }
    // thin source: one planted near-dup pair, under the cap
    val thin = Seq(
      (100L, "completely different text about spark shuffle partitions",
        "en", "thin", 50L),
      (101L, "completely different text about spark shuffle partitioning",
        "en", "thin", 50L),
      (102L, "unrelated corpus quality scoring tokens languages entropy",
        "en", "thin", 50L))
    (fat ++ thin).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("d4 block cap drops the fat source, keeps the thin one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_capspec")
      .toString
    corpus(dir)
    val capped = DedupQueries.ngramJaccard(spark, dir, cap = 10)
      .collect()
    assert(capped.nonEmpty, "thin-source near-dup pair must survive")
    assert(capped.forall(r => r.getLong(0) >= 100L && r.getLong(1) >= 100L),
      s"fat-source pairs leaked through the cap: ${capped.mkString(", ")}")
    // and without the cap the fat source floods the result
    val uncapped = DedupQueries.ngramJaccard(spark, dir, cap = 1000)
      .collect()
    assert(uncapped.count(r => r.getLong(0) < 100L) > 0,
      "control: fat source must produce pairs when the cap does not bind")
  }
}
