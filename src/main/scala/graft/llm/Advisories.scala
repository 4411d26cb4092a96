package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The queryable advisory surface (round-11 verdict item 3). Every
  * recall/staleness advisory family in the engine fires through slf4j
  * — which dies in executor stdout at cluster scale, where the
  * operator that needs the re-dial is an ORCHESTRATOR reading tables.
  * This registry accumulates every advisory whose condition held
  * (family, corpus, measured signal, the computed re-dial, and a
  * timestamp-free insertion ordinal), deduped per (family, corpus)
  * exactly like the log-once gates, and exposes it as the catalog
  * query `r26_advisories`: evaluate the corpus's census-based
  * advisory conditions NOW, then return everything recorded for the
  * corpus this process. On healthy default-dial testdata the result
  * is deterministically EMPTY — computed emptiness, not vacuous: the
  * query re-runs all five census checks (sidecar-cached, so the
  * steady-state cost is five file reads) — which is what the DuckDB
  * oracle pins. FamilyRecallAdvisorySpec pins the non-empty side on
  * saturated fixtures.
  *
  * Advisory families recorded here: dedup LSH bucket cap, exact
  * pairwise block cap, hyperplane-LSH cap (d9), pHash Hamming-band
  * cap (m5), ANN serving dials (merged cells), and index staleness
  * (n18's frozen-model drift — recorded when a maintenance run fires
  * it; not re-evaluated by r26, which has no delta batch to measure).
  */
object Advisories {

  final case class Advisory(
      family: String, corpus: String, signal: Double, redial: String,
      ordinal: Long)

  private val fired =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Advisory]()
  private val counter = new java.util.concurrent.atomic.AtomicLong()

  /** Record a fired advisory. Idempotent per (family, corpus) — the
    * registry carries the FIRST firing's measurement, matching the
    * log-once gates; the ordinal is insertion order (timestamp-free,
    * so replays stay deterministic). Called on EVERY evaluation whose
    * condition holds, not just the one that wins the log-once race,
    * so a spec that cleared the registry re-fills it on the next
    * evaluation even though the slf4j line stays silent.
    */
  def record(
      family: String, corpus: String, signal: Double,
      redial: String): Unit =
    fired.computeIfAbsent((family, corpus),
      _ => Advisory(family, corpus, signal, redial,
        counter.incrementAndGet()))

  /** All advisories recorded for `corpus`, ordered by family. */
  def forCorpus(corpus: String): Seq[Advisory] =
    fired.values.toArray(Array.empty[Advisory])
      .filter(_.corpus == corpus).sortBy(_.family).toSeq

  /** Everything recorded this process, in firing order — the
    * `<catalog>.system.advisories` SQL face reads this. */
  def all: Seq[Advisory] =
    fired.values.toArray(Array.empty[Advisory]).sortBy(_.ordinal).toSeq

  /** Spec hook: forget everything recorded (process-scoped state). */
  private[graft] def clear(): Unit = { fired.clear(); counter.set(0L) }

  /** Evaluate the corpus's census-based advisory families now (each
    * is sidecar-cached and advisory-only — a failure skips its
    * family, never this query), then relate everything recorded.
    */
  private[graft] def evaluateAndList(
      s: SparkSession, d: String): Seq[Advisory] = {
    DedupQueries.maybeWarnDedupRecall(s, d)
    DedupQueries.maybeWarnBlockCap(s, d)
    SimilarityQueries.maybeWarnRecall(s, d)
    SimilarityQueries.maybeWarnEmbeddingRecall(s, d)
    MultimodalQueries.maybeWarnPhashRecall(s, d)
    forCorpus(d)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R26 — SHOW ADVISORIES as a relation: the round-11 census
    // instrumentation, readable by an orchestrator instead of grep
    // over executor logs. Scale shape: five sidecar reads plus a
    // local relation of at-most-|families| rows — no corpus scan on
    // the steady path (each census computes once per corpus and
    // persists fingerprint-keyed).
    "r26_advisories" -> ((s, d) => {
      import s.implicits._
      evaluateAndList(s, d)
        .map(a => (a.family, a.corpus, a.signal, a.redial, a.ordinal))
        .toDF("family", "corpus", "signal", "redial", "ordinal")
        .orderBy("family")
    }))

  val oracle: Map[String, String] = Map(
    // healthy default-dial testdata fires nothing (d7/d9/block-cap
    // shed ≈ 0–1.4%; m5's designed ~20% sits under its calibrated 50%
    // threshold; the ANN index's cells are not majority-merged) — the
    // oracle pins the EMPTY relation with the exact schema, and
    // FamilyRecallAdvisorySpec pins the rows that appear when the
    // conditions hold on saturated fixtures
    "r26_advisories" ->
      """SELECT CAST(NULL AS VARCHAR) AS family,
        |  CAST(NULL AS VARCHAR) AS corpus,
        |  CAST(NULL AS DOUBLE) AS signal,
        |  CAST(NULL AS VARCHAR) AS redial,
        |  CAST(NULL AS BIGINT) AS ordinal
        |WHERE false""".stripMargin)
}
