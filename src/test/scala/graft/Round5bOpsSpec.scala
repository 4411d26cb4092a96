package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.{spark, sf001}

/** Round-5 additions: w5 batch sessionization, d13 containment dedup,
  * x19 linear quality classifier, c12 language rebalancing. The DuckDB
  * oracle pins every result on the testdata; these specs pin the
  * SEMANTICS on adversarial inputs (the 30-min gap boundary, a subset
  * duplicate that resemblance misses, exact decimal logits) and the
  * SCALE MECHANISMS (w5's single event exchange, c12's map-only gate).
  */
class Round5bOpsSpec extends AnyFunSuite {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_r5b").toString
    rows.map { case (id, text, lang, source) =>
      (id, text, lang, source, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("w5 opens a new session exactly when the gap exceeds 30 min") {
    val dir = java.nio.file.Files.createTempDirectory("graft_w5").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: three events inside one session (the 1800s gap is NOT
    // > 1800s — boundary stays in-session), then a 1801s gap opens
    // session 2; user 2: a lone event
    Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(1800), 1L, "click", 2.0, "{}"),
      (3L, ts(2000), 1L, "view", 3.0, "{}"),
      (4L, ts(3801), 1L, "purchase", 4.0, "{}"),
      (5L, ts(3900), 1L, "view", 5.0, "{}"),
      (6L, ts(50), 2L, "view", 7.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("w5_sessionize")(spark, dir)
      .select("user_id", "session_seq", "n_events", "sum_value",
        "duration_us")
      .as[(Long, Long, Long, Double, Long)].collect().toList
    assert(got == List(
      (1L, 1L, 3L, 6.0, 2000L * 1000000),
      (1L, 2L, 2L, 9.0, 99L * 1000000),
      (2L, 1L, 1L, 7.5, 0L)))
  }

  test("w5 ships the event log through one hash exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("w5_sessionize")(spark, sf001)
        .queryExecution.executedPlan
      val hashEx = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning
              .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
      }
      // both windows AND the (user_id, session_seq) aggregate ride the
      // single hash(user_id) exchange; only the presentation sort adds
      // a range exchange on top
      assert(hashEx.size == 1,
        s"expected exactly 1 hash exchange, got ${hashEx.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("d13 catches a subset duplicate that d4 resemblance misses") {
    val words = (1 to 120).map(i => s"tokenword$i")
    val long = words.mkString(" ")
    val short = words.take(12).mkString(" ") // verbatim head of `long`
    val other = (1 to 60).map(i => s"unrelated$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, long, "en", "s"), (2L, short, "en", "s"), (3L, other, "en", "s")))
    val cont = SparkEntry.queries("d13_containment")(spark, dir)
      .select("doc_a", "doc_b", "containment", "jaccard")
      .as[(Long, Long, Double, Double)].collect().toList
    assert(cont.map(r => (r._1, r._2)) == List((1L, 2L)))
    assert(cont.head._3 == 1.0, s"verbatim subset must contain fully: $cont")
    assert(cont.head._4 < 0.5, s"resemblance must miss the pair: $cont")
    val jac = SparkEntry.queries("d4_ngram_jaccard")(spark, dir).count()
    assert(jac == 0, "d4's jaccard >= 0.5 gate must not fire on a subset dup")
  }

  test("x19 logits are exact decimal sums; zero-hit docs score the bias") {
    val dir = docsDir(Seq(
      (1L, "error error slow", "en", "s"),
      (2L, "spark fast vector", "en", "s"),
      (3L, "zzz qqq unknowable", "en", "s")))
    val got = SparkEntry.queries("x19_quality_classifier")(spark, dir)
      .as[(Long, Double, Boolean)].collect().toList
    assert(got == List(
      (1L, -2.5 * 2 - 1.5 - 1.0, false),
      (2L, 1.5 + 1.0 + 1.25 - 1.0, true),
      (3L, -1.0, false)))
  }

  test("c12 keeps the smallest language whole and downsamples the rest") {
    val en = (1L to 40L).map(i => (i, s"endoc number$i", "en", "s"))
    val fr = (101L to 110L).map(i => (i, s"frdoc numero$i", "fr", "s"))
    val dir = docsDir(en ++ fr)
    val got = SparkEntry.queries("c12_language_rebalance")(spark, dir)
      .select("lang", "n_kept").as[(String, Long)].collect().toMap
    assert(got("fr") == 10L, "the floor language is never downsampled")
    // en targets 10/40 = 250000 ppm; the md5 gate lands within hash
    // noise of the target and far under the original 40
    assert(got("en") >= 3L && got("en") <= 20L,
      s"en kept ${got("en")}, expected ~10 of 40")
    // the gate keys on doc_id alone, so the selection is reproducible
    val again = SparkEntry.queries("c12_language_rebalance")(spark, dir)
      .select("lang", "n_kept").as[(String, Long)].collect().toMap
    assert(again == got)
  }
}
