package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation operators from SURVEY.md §2 (rows A1–A6, A9, O4)
  * re-expressed over the driver testdata tables so the DuckDB oracle
  * can check them (reference semantics: `etl/transform.py:98-127,
  * 190-225` — count/sum/RTP/hit-frequency/value-counts/volatility).
  *
  * Cross-engine determinism rules used throughout this package:
  *   - money sums go through DECIMAL(18,2) (exact, order-independent),
  *     then back to DOUBLE for a stable comparable value;
  *   - `round` (HALF_UP, matches DuckDB's half-away-from-zero on the
  *     shortest decimal representation) in oracle-facing queries;
  *     `bround` (HALF_EVEN, matches Python) only in the pol-domain
  *     golden path where the reference's rounding is load-bearing;
  *   - every result ends in a total ORDER BY so row order is identical
  *     regardless of how the driver hashes;
  *   - variance terms are rounded then summed as DECIMAL so the
  *     reference's round-then-sum order (SURVEY §2 A6) is exact.
  *
  * Scale notes: all aggregations here are single-shuffle hash
  * aggregates with map-side partial aggregation; the only join (A3)
  * broadcasts the dimension side. Nothing collects to the driver.
  */
object AggQueries {
  import graft.Tables._

  /** Exact decimal sum of a 2-decimal money column, surfaced as double. */
  private def moneySum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 — count/size per group (ref etl/transform.py:190)
    "a1_count" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    // A2 — sum (ref etl/transform.py:220); decimal path for money
    "a2_sum" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          sum($("l_quantity")).as("sum_qty"),
          moneySum($("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag")),

    // A3 — RTP: round(sum/(n*bet)*100, 2) guarded by bet>0 ∧ n>0
    // (ref etl/transform.py:218-221); part.p_retailprice plays `bet`,
    // broadcast-joined like the game lookup (J1 shape).
    "a3_rtp" -> ((s, d) => {
      val li = lineitem(s, d)
        .groupBy("l_partkey")
        .agg(sum($("l_quantity")).as("sum_win"), count(lit(1)).as("n"))
      li.join(broadcast(part(s, d)), li("l_partkey") === col("p_partkey"), "left")
        .select(
          $("l_partkey"),
          when($("p_retailprice") > 0 && $("n") > 0,
            round($("sum_win") / ($("n") * $("p_retailprice")) * 100, 2))
            .as("rtp"))
        .orderBy("l_partkey")
    }),

    // A4 — hit frequency: round(count(win>0)/n*100, 2)
    // (ref etl/transform.py:223-225); threshold models win>0.
    "a4_hit_frequency" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(
          sum(when($("l_quantity") > 25, 1L).otherwise(0L)) * lit(100.0) / count(lit(1)),
          2).as("hit_freq"))
        .orderBy("l_returnflag")),

    // A5 — value_counts: group-by count sorted by value
    // (ref etl/transform.py:113-116).
    "a5_value_counts" -> ((s, d) =>
      lineitem(s, d)
        .groupBy($("l_quantity").as("winning"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("winning")),

    // A6 — volatility at 90% CI, the reference's exact computation
    // order (ref etl/transform.py:98-127): per distinct win w,
    // var_w = round(freq*(w/bet - rtp/100)^2, 4), summed THEN
    // vol = round(1.645*sqrt(sum), 2); rtp is the already-rounded
    // value (trap #3 in SURVEY §7). The rounded var terms are summed
    // as DECIMAL(18,4) so the sum is exact in any order — this is
    // what makes the round-then-sum contract scale-safe (partial
    // aggregation can combine in any order without drift).
    "a6_volatility" -> ((s, d) => {
      val bet = lit(5.0)
      val li = lineitem(s, d)
        .select(($("l_orderkey") % 50).as("pool"), $("l_quantity").as("win"))
      val pool = li.groupBy("pool")
        .agg(sum($("win")).as("sum_win"), count(lit(1)).as("n"))
        .withColumn("rtp", round($("sum_win") / ($("n") * bet) * 100, 2))
      val counts = li.groupBy("pool", "win").agg(count(lit(1)).as("cnt"))
      counts.join(pool, "pool")
        .withColumn("var_w",
          round(($("cnt") / $("n")) * pow($("win") / bet - $("rtp") / 100, 2), 4)
            .cast("decimal(18,4)"))
        .groupBy("pool")
        .agg(
          first($("rtp")).as("rtp"),
          round(lit(1.645) * sqrt(sum($("var_w")).cast("double")), 2).as("volatility"))
        .orderBy("pool")
    }),

    // A7 — cross-file aggregated summary, oracle-gated (the golden-
    // JSON path in pol/PoolSummary pins the byte-exact reference
    // shape; this entry proves the same aggregation CONTENT against
    // DuckDB over testdata): tag distribution (lang plays tag),
    // files-by-folder (source plays folder), and min/max/avg over the
    // per-pool rtp/volatility of a6. Long format (section, k, v) so
    // three heterogeneous summary blocks ride one comparable schema.
    // The avg goes through an exact DECIMAL sum of the already-2dp
    // values — partial-aggregation order cannot drift the double.
    "a7_summary" -> ((s, d) => {
      val docs = documents(s, d)
      val tags = docs.groupBy(col("lang").as("k"))
        .agg(count(lit(1)).cast("double").as("v"))
        .withColumn("section", lit("tags"))
      val folders = docs.groupBy(col("source").as("k"))
        .agg(count(lit(1)).cast("double").as("v"))
        .withColumn("section", lit("files_by_folder"))
      val pools = queries("a6_volatility")(s, d)
      val stats = pools.agg(
        min($("rtp")).as("rtp_min"),
        max($("rtp")).as("rtp_max"),
        round(sum($("rtp").cast("decimal(18,2)")).cast("double")
          / count(lit(1)), 2).as("rtp_avg"),
        min($("volatility")).as("volatility_min"),
        max($("volatility")).as("volatility_max"),
        round(sum($("volatility").cast("decimal(18,2)")).cast("double")
          / count(lit(1)), 2).as("volatility_avg"),
        count(lit(1)).cast("double").as("n_pools"))
      val statsLong = stats.selectExpr(
        """stack(7,
          |  'rtp_min', rtp_min, 'rtp_max', rtp_max, 'rtp_avg', rtp_avg,
          |  'volatility_min', volatility_min, 'volatility_max', volatility_max,
          |  'volatility_avg', volatility_avg, 'n_pools', n_pools)
          |AS (k, v)""".stripMargin)
        .withColumn("section", lit("stats"))
      tags.unionByName(folders).unionByName(statsLong)
        .select("section", "k", "v")
        .orderBy("section", "k")
    }),

    // A9 — rich per-group stats (declared surface, ref README.md:66-103):
    // count/sum/min/max/avg/median/stddev/distinct. stddev is computed
    // from exact integer-valued sums (sum, sum of squares) so both
    // engines do the identical scalar arithmetic.
    //
    // Round-13 shape: aggregate to (flag, value, count) FIRST, then
    // derive every statistic from the value-count table. The direct
    // formulation's `median` is a Percentile aggregate whose buffer
    // COLLECTS EVERY ROW of the group (a group with 10^10 rows at
    // corpus scale is an executor OOM, §5) and its countDistinct adds
    // an Expand doubling the scanned rows. Here the map side partial-
    // aggregates to ≤ |flags|·|distinct values| rows, the median is
    // reconstructed exactly from cumulative counts (lower/upper rank
    // = floor((n+1)/2) / floor(n/2)+1 — Percentile's 0.5
    // interpolation (v_lo + v_hi)/2, bit-equal for odd n since
    // lo = hi), n_distinct is count of non-null value groups, and the
    // remaining sums weight by the count. Values are integral doubles
    // (< 2^53), so the weighted sums are the exact same doubles the
    // row-at-a-time sums produce. Null values: excluded from cum/
    // rank (Percentile and countDistinct skip them) but counted in n
    // (count(1) never skipped), exactly as before.
    "a9_rich_stats" -> ((s, d) => {
      val vc = lineitem(s, d)
        .groupBy($("l_returnflag").as("type_code"),
          $("l_quantity").as("q"))
        .agg(count(lit(1)).as("c"))
      val byFlag = org.apache.spark.sql.expressions.Window
        .partitionBy("type_code")
      val cum = vc
        .withColumn("cum", sum(when(col("q").isNotNull, col("c"))
          .otherwise(lit(0L))).over(byFlag.orderBy(col("q").asc_nulls_first)))
        .withColumn("nn", sum(when(col("q").isNotNull, col("c"))
          .otherwise(lit(0L))).over(byFlag))
      cum.groupBy("type_code")
        .agg(
          // coalesce only for schema parity with count(1)'s
          // nullable=false — groups are non-empty, the value is
          // always the sum
          coalesce(sum(col("c")), lit(0L)).as("n"),
          sum(col("q") * col("c")).as("sum_v"),
          min(col("q")).as("min_v"),
          max(col("q")).as("max_v"),
          round(sum(col("q") * col("c")) / sum(col("c")), 4).as("avg_v"),
          ((min(when(col("cum") >= expr("(nn + 1) DIV 2") &&
              col("q").isNotNull, col("q"))) +
            min(when(col("cum") >= expr("nn DIV 2 + 1") &&
              col("q").isNotNull, col("q")))) / 2).as("median_v"),
          round(sqrt(
            (sum(col("q") * col("q") * col("c")) -
              sum(col("q") * col("c")) * sum(col("q") * col("c")) /
                sum(col("c"))) /
              (sum(col("c")) - 1)), 4).as("stddev_v"),
          count(col("q")).as("n_distinct"))
        .orderBy("type_code")
    }),

    // A9b — bucketed value histogram with percentages
    // (ref README.md:94-99): floor(value/width) buckets.
    "a9_histogram" -> ((s, d) => {
      val li = lineitem(s, d)
      val total = li.count() // tiny scalar; bucket % needs the grand total
      li.groupBy(floor($("l_extendedprice") / 10000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("pct", round($("cnt") * lit(100.0) / lit(total), 2))
        .orderBy("bucket")
    }),

    // O4 — exact distinct count (ref README.md:75 `unique_types`).
    "o4_distinct_count" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct($("l_partkey")).as("n_parts"),
          countDistinct($("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")),

    // O5 — the exact-at-small / approximate-at-scale substitution,
    // driver-gated: HLL++ distinct vs the exact count, surfaced as a
    // within-5% boolean (HLL merge is order-independent, so the flag
    // is deterministic under any partitioning; rsd 2%).
    //
    // Shape: distinct FIRST, then count + sketch over the distinct
    // relation. Mixing countDistinct with approx_count_distinct in one
    // agg makes Spark's distinct-aggregate rewrite carry the partial
    // HLL buffer — 408 LONG columns at rsd 2% — on EVERY
    // (flag, partkey) group row through the distinct exchange
    // (~3.3 KB/row where the key is 16 B; measured 1.7 s vs o4's
    // 0.5 s on the same scan). HLL registers are max-over-hashes, so
    // the sketch over deduplicated keys is bit-identical, count over
    // the distinct rows equals countDistinct (both skip nulls), and
    // the buffer now exists only in the 3-group second aggregate.
    "o5_approx_within_tol" -> ((s, d) =>
      lineitem(s, d)
        .select($("l_returnflag"), $("l_partkey"))
        .distinct()
        .groupBy("l_returnflag")
        .agg(
          count($("l_partkey")).as("n_exact"),
          approx_count_distinct($("l_partkey"), 0.02).as("__approx"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("__approx") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("within_tol"))
        .orderBy("l_returnflag")),

    // R16 — salted two-phase aggregation (Skew.saltedAggregate) driven
    // through the oracle gate: 3 hot keys spread over 16 salt buckets,
    // decimal sums so the extra combine stage is order-independent and
    // the result equals the unsalted plan bit-for-bit.
    "r16_salted_agg" -> ((s, d) =>
      Skew.saltedAggregate(
          lineitem(s, d),
          Seq("l_returnflag"),
          scala.collection.immutable.ListMap(
            "sum_qty" -> (col("l_quantity").cast("decimal(18,2)"), "sum"),
            "n" -> (col("l_quantity"), "count"),
            "min_q" -> (col("l_quantity"), "min"),
            "max_q" -> (col("l_quantity"), "max")))
        .select(col("l_returnflag"), col("sum_qty").cast("double").as("sum_qty"),
          col("n"), col("min_q"), col("max_q"))
        .orderBy("l_returnflag")),

    // R20 — distribution summaries per group: exact interpolated
    // percentiles (oracle-pinned) alongside the at-scale substitution,
    // approx_percentile (t-digest-like sketch, mergeable map-side),
    // surfaced o5-style as a within-tolerance flag. At 100 TB the
    // exact form's per-group sort is the cost; the sketch keeps the
    // same plan shape with bounded per-partition state.
    "r20_percentiles" -> ((s, d) =>
      events(s, d)
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"),
          expr("approx_percentile(value, 0.9, 1000)").as("__ap90"),
          expr("percentile(value, 0.9)").as("__ep90"))
        .select(col("event_type"), col("p50"), col("p90"), col("p99"),
          (abs(col("__ap90") - col("__ep90")) <= abs(col("__ep90")) * 0.05)
            .as("approx_within_tol"))
        .orderBy("event_type"))
  )

  private def $(name: String): Column = col(name)

  private val sqlA6 =
    """WITH li AS (
      |  SELECT l_orderkey % 50 AS pool, l_quantity AS win FROM lineitem
      |), pool AS (
      |  SELECT pool, sum(win) AS sum_win, count(*) AS n,
      |         round(CAST(sum(win) / (count(*) * 5.0) * 100 AS DOUBLE), 2) AS rtp
      |  FROM li GROUP BY pool
      |), counts AS (
      |  SELECT pool, win, count(*) AS cnt FROM li GROUP BY pool, win
      |)
      |SELECT c.pool, any_value(p.rtp) AS rtp,
      |  round(1.645 * sqrt(CAST(sum(CAST(
      |    round(CAST((c.cnt * 1.0 / p.n) * (c.win / 5.0 - p.rtp / 100) *
      |          (c.win / 5.0 - p.rtp / 100) AS DOUBLE), 4)
      |    AS DECIMAL(18,4))) AS DOUBLE)), 2) AS volatility
      |FROM counts c JOIN pool p USING (pool)
      |GROUP BY c.pool""".stripMargin

  val oracle: Map[String, String] = Map(
    "a1_count" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a2_sum" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "a3_rtp" ->
      """SELECT l_partkey,
        |  CASE WHEN p_retailprice > 0 AND n > 0
        |       THEN round(CAST(sum_win / (n * p_retailprice) * 100 AS DOUBLE), 2) END AS rtp
        |FROM (SELECT l_partkey, sum(l_quantity) AS sum_win, count(*) AS n
        |      FROM lineitem GROUP BY 1) f
        |LEFT JOIN part ON l_partkey = p_partkey
        |ORDER BY l_partkey""".stripMargin,
    "a4_hit_frequency" ->
      """SELECT l_returnflag,
        |  round(CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) * 100.0
        |        / count(*) AS DOUBLE), 2) AS hit_freq
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "a5_value_counts" ->
      """SELECT l_quantity AS winning, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "a6_volatility" -> s"$sqlA6 ORDER BY c.pool",
    "a7_summary" ->
      s"""WITH pools AS ($sqlA6),
         |stats AS (
         |  SELECT min(rtp) AS rtp_min, max(rtp) AS rtp_max,
         |    round(CAST(sum(CAST(rtp AS DECIMAL(18,2))) AS DOUBLE)
         |      / count(*), 2) AS rtp_avg,
         |    min(volatility) AS volatility_min,
         |    max(volatility) AS volatility_max,
         |    round(CAST(sum(CAST(volatility AS DECIMAL(18,2))) AS DOUBLE)
         |      / count(*), 2) AS volatility_avg,
         |    CAST(count(*) AS DOUBLE) AS n_pools
         |  FROM pools)
         |SELECT * FROM (
         |  SELECT 'tags' AS section, lang AS k, CAST(count(*) AS DOUBLE) AS v
         |  FROM documents GROUP BY lang
         |  UNION ALL
         |  SELECT 'files_by_folder', source, CAST(count(*) AS DOUBLE)
         |  FROM documents GROUP BY source
         |  UNION ALL SELECT 'stats', 'rtp_min', rtp_min FROM stats
         |  UNION ALL SELECT 'stats', 'rtp_max', rtp_max FROM stats
         |  UNION ALL SELECT 'stats', 'rtp_avg', rtp_avg FROM stats
         |  UNION ALL SELECT 'stats', 'volatility_min', volatility_min FROM stats
         |  UNION ALL SELECT 'stats', 'volatility_max', volatility_max FROM stats
         |  UNION ALL SELECT 'stats', 'volatility_avg', volatility_avg FROM stats
         |  UNION ALL SELECT 'stats', 'n_pools', n_pools FROM stats)
         |ORDER BY section, k""".stripMargin,
    "a9_rich_stats" ->
      """SELECT l_returnflag AS type_code, count(*) AS n,
        |  sum(l_quantity) AS sum_v, min(l_quantity) AS min_v,
        |  max(l_quantity) AS max_v,
        |  round(CAST(sum(l_quantity) / count(*) AS DOUBLE), 4) AS avg_v,
        |  median(CAST(l_quantity AS DOUBLE)) AS median_v,
        |  round(CAST(sqrt((sum(l_quantity * l_quantity) -
        |        sum(l_quantity) * sum(l_quantity) / count(*)) /
        |        (count(*) - 1)) AS DOUBLE), 4) AS stddev_v,
        |  count(DISTINCT l_quantity) AS n_distinct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "a9_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
        |  count(*) AS cnt,
        |  round(CAST(count(*) * 100.0 / (SELECT count(*) FROM lineitem) AS DOUBLE), 2) AS pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "o4_distinct_count" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "o5_approx_within_tol" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact,
        |  TRUE AS within_tol
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "r16_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(l_quantity) AS n, min(l_quantity) AS min_q,
        |  max(l_quantity) AS max_q
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "r20_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99,
        |  TRUE AS approx_within_tol
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
