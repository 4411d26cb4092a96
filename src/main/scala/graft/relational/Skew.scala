package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (SCALING.md): AQE's skew-join
  * splitting covers sort-merge joins automatically in Spark 4, but two
  * shapes still need manual salting on a real cluster:
  *
  *   1. aggregations where one key dominates (a single reducer task
  *      receives the hot key's entire volume), and
  *   2. joins against a dimension too big to broadcast where the fact
  *      side is hot-keyed.
  *
  * Correctness note: salting only commutes with ALGEBRAIC aggregates
  * (sum/count/min/max — and graft's decimal-exact money sums, which is
  * one more reason the catalog prefers them); both helpers are
  * semantics-preserving by construction and the spec pins salted ==
  * unsalted on skewed data.
  */
object Skew {

  /** Uniform per-row salt in [0, buckets). Derived from a row id, not
    * `rand()`, so re-execution of a failed task re-salts identically
    * (rand() + task retry can double-count under speculative
    * execution).
    */
  private def salt(buckets: Int): Column =
    pmod(hash(monotonically_increasing_id()), lit(buckets))

  /** Two-phase salted aggregation: partial aggregate on (keys, salt) —
    * spreading a hot key over `buckets` reducers — then final combine
    * on the keys. `aggs` maps output column name → (input column,
    * one of sum|count|min|max).
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      aggs: Map[String, (Column, String)],
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", salt(buckets))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        aggs.head._2 match { case (c, f) => partialExpr(c, f).as(aggs.head._1) },
        aggs.tail.map { case (n, (c, f)) => partialExpr(c, f).as(n) }.toSeq: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        finalExpr(aggs.head._1, aggs.head._2._2).as(aggs.head._1),
        aggs.tail.map { case (n, (_, f)) => finalExpr(n, f).as(n) }.toSeq: _*)
  }

  private def partialExpr(c: Column, f: String): Column = f match {
    case "sum" => sum(c)
    case "count" => count(c)
    case "min" => min(c)
    case "max" => max(c)
    case other => throw new IllegalArgumentException(
      s"non-algebraic aggregate '$other' cannot be salted")
  }

  private def finalExpr(name: String, f: String): Column = f match {
    case "sum" | "count" => sum(col(name))
    case "min" => min(col(name))
    case "max" => max(col(name))
    case other => throw new IllegalArgumentException(other)
  }

  /** Join types for which replicating the dim side is equivalence-
    * preserving: every emitted row is driven by a fact row. Right/full
    * outer would emit each UNMATCHED dim row `buckets` times.
    */
  private val saltableJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  /** Salted equi-join for a hot-keyed fact against a non-broadcastable
    * dimension: the fact side gets a uniform salt, the dim side is
    * replicated once per bucket, and the join key becomes (key, salt) —
    * splitting each hot key across `buckets` tasks. Fact-driven join
    * types only (see [[saltableJoinTypes]]).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      buckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(saltableJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin: '$joinType' would duplicate unmatched dim rows " +
        s"$buckets times; use a plain join for right/full outer")
    val saltedFact = fact.withColumn("__salt", salt(buckets))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    // shuffle-hash hints: the dim is non-broadcastable BY CONTRACT
    // (that is why it is being salted), but size estimation cannot see
    // the replication explode and would happily broadcast it — which
    // both defeats the salting and dies at scale
    saltedFact.hint("shuffle_hash")
      .join(replicatedDim.hint("shuffle_hash"), Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
