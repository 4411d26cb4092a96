package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort / limit / set-op / window operators from SURVEY §2 (O1–O4, W1).
  * The first/last-10 sampling (O2, declared in the reference's README
  * output contract) is a window `row_number` over both directions —
  * rank from each end, keep ranks ≤ 10.
  */
object SortWindowQueries {
  import graft.Tables._

  /** 16-bit Morton (z-order) interleave of the low 8 bits of `a` and
    * `b` — bit-disjoint terms, so `+` is `|`. Plain arithmetic/bitwise
    * SQL, valid verbatim in both Spark SQL and DuckDB.
    */
  private val zInterleave: String = (0 until 8)
    .flatMap(i => Seq(
      s"(((a >> $i) & 1) << ${2 * i})",
      s"(((b >> $i) & 1) << ${2 * i + 1})"))
    .mkString(" + ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1 — global sort with deterministic tiebreak + limit pushdown
    // (TakeOrderedAndProject, no full sort at scale).
    "o1_sort_limit" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)),

    // O2 — first-10/last-10 rows in (orderkey, linenumber) order.
    // Expressed as two ordered limits (planned as TakeOrderedAndProject
    // — no global window, no single-partition shuffle at scale) with an
    // anti-join so overlapping rows keep the 'first' label, matching
    // the window-rank formulation exactly.
    "o2_first_last" -> ((s, d) => {
      val base = lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val first10 = base
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .limit(10)
        .withColumn("which", lit("first"))
      val last10 = base
        .orderBy(col("l_orderkey").desc, col("l_linenumber").desc,
          col("l_quantity").desc)
        .limit(10)
        .withColumn("which", lit("last"))
      first10.unionByName(
          last10.join(
            first10.select("l_orderkey", "l_linenumber", "l_quantity"),
            Seq("l_orderkey", "l_linenumber", "l_quantity"), "left_anti"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    }),

    // O3 — union + dedupe by full row.
    "o3_union_dedupe" -> ((s, d) =>
      orders(s, d).where(col("o_orderkey") % 2 === 0).select("o_custkey")
        .unionByName(
          orders(s, d).where(col("o_orderkey") % 3 === 0).select("o_custkey"))
        .dropDuplicates()
        .orderBy("o_custkey")),

    // W1 — ranking + frame-based running aggregate per partition.
    "w1_window_rank" -> ((s, d) => {
      val order = Window.partitionBy("s_nationkey")
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      supplier(s, d)
        .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
          row_number().over(order).as("rn"),
          rank().over(Window.partitionBy("s_nationkey")
            .orderBy(col("s_acctbal").desc)).as("rnk"),
          sum(col("s_acctbal").cast("decimal(18,2)"))
            .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_bal"))
        .orderBy("s_nationkey", "rn")
    }),

    // O6 — z-order layout clustering: Morton-interleave the low 8 bits
    // of (partkey, suppkey) and tile the z-range (tile = z >> 11, 32
    // tiles). Per-tile min/max of BOTH keys shows each tile covering a
    // narrow rectangle of the 2-D key space — the property that makes
    // z-ordered file layout prunable on either dimension. tile is a
    // pure function of z (no sampled range partitioner, no global
    // sort), so the plan is one partial-aggregated hash agg, and the
    // result is deterministic for the oracle. At scale, the same z
    // expression feeds repartitionByRange(z) + sortWithinPartitions(z)
    // on write, and these per-tile bounds are exactly the file-footer
    // min/max stats a reader prunes with.
    "o6_zorder_layout" -> ((s, d) =>
      lineitem(s, d)
        .select((col("l_partkey") % 256).cast("long").as("a"),
          (col("l_suppkey") % 256).cast("long").as("b"))
        .withColumn("z", expr(zInterleave))
        .groupBy(expr("CAST(z >> 11 AS INT)").as("tile"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("a")).as("a_min"), max(col("a")).as("a_max"),
          min(col("b")).as("b_min"), max(col("b")).as("b_max"))
        .orderBy("tile")),

    // W2 — event-stream analytics: lag/lead navigation plus a
    // frame-bounded moving sum per user. Time runs in exact integer
    // microseconds floored from the raw nanos column (`ts_ns div
    // 1000` — the convenience `ts` micros column is produced by a
    // double division that is 1 µs off on large epochs, so the exact
    // path goes back to the source integer); the moving sum runs in
    // DECIMAL so the frame aggregate is order-independent and
    // engine-exact. Partitioned by user_id — per-user event counts
    // are bounded, so no single-task window at scale (contrast x12's
    // vocabulary-global rank).
    "w2_event_rolling" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      events(s, d)
        .withColumn("us", expr("ts_ns div 1000"))
        .select(col("event_id"), col("user_id"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          (col("us") - lag(col("us"), 1).over(w)).as("gap_us"),
          sum(col("value").cast("decimal(18,2)"))
            .over(w.rowsBetween(-3, Window.currentRow))
            .cast("double").as("mov_sum"))
        .orderBy("user_id", "event_id")
    }),

    // W3 — ordered conversion FUNNEL (view → click → purchase, each
    // stage strictly after the previous one's FIRST occurrence): the
    // canonical product-analytics query. The sequential dependency
    // (first qualifying click needs the first view's time) is three
    // chained whole-partition window minima over ONE user_id
    // partitioning — a single exchange, three Window nodes, then a
    // same-key groupBy that reuses the partitioning (no second
    // shuffle; .explain-audited). This is the shape that survives
    // 100 TB: the naive per-stage aggregate-and-join-back plan
    // shuffles the event log once per stage and carries a user-level
    // relation that may not broadcast; here per-user event width is
    // bounded and nothing user-level ever ships. Conversion rates are
    // integer PPM (x13 discipline) so no float crosses the engines.
    "w3_funnel" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
      val staged = events(s, d)
        .withColumn("us", expr("ts_ns div 1000"))
        .select(col("user_id"), col("event_type"), col("us"))
        .withColumn("tv",
          min(when(col("event_type") === "view", col("us"))).over(w))
        .withColumn("tc",
          min(when(col("event_type") === "click" &&
            col("us") > col("tv"), col("us"))).over(w))
        .withColumn("tp",
          min(when(col("event_type") === "purchase" &&
            col("us") > col("tc"), col("us"))).over(w))
      staged.groupBy("user_id")
        .agg(max(col("tv")).as("tv"), max(col("tc")).as("tc"),
          max(col("tp")).as("tp"))
        .agg(count(col("tv")).as("users_view"),
          count(col("tc")).as("users_click"),
          count(col("tp")).as("users_purchase"))
        .select(col("users_view"), col("users_click"),
          col("users_purchase"),
          expr("users_click * 1000000 div users_view").as("click_ppm"),
          expr("users_purchase * 1000000 div users_view")
            .as("purchase_ppm"))
    }),

    // W4 — retention COHORT matrix: users bucketed by signup week,
    // activity counted per week offset since each user's own signup
    // day — the second canonical product-analytics query. Time is
    // exact integer day numbers (`ts_ns div ns-per-day`), offsets are
    // integer `div 7`, so the matrix is engine-exact with no calendar
    // functions in the hot path. Plan shape: ONE user_id window
    // (bounded per-user width) tags every event with its user's
    // cohort day map-side after the single exchange; the final agg is
    // keyed on (cohort_week, week_offset) — a bounded matrix, with
    // the exact distinct-user count expanding to the standard
    // two-phase partial agg. Pre-signup events are excluded (a user
    // is not retained before existing).
    "w4_retention_cohort" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
      events(s, d)
        .withColumn("day", expr("ts_ns div 86400000000000"))
        .select(col("user_id"), col("event_type"), col("day"))
        .withColumn("cohort_day",
          min(when(col("event_type") === "signup", col("day"))).over(w))
        .where(col("cohort_day").isNotNull &&
          col("day") >= col("cohort_day"))
        .groupBy(expr("cohort_day div 7").as("cohort_week"),
          expr("(day - cohort_day) div 7").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // W5 — batch sessionization: the gap-based session assignment
    // (30-min inactivity closes a session) that t8 runs under
    // streaming state, expressed as the classic lag → gap-flag →
    // running-sum window pair over ONE user_id partitioning. The
    // whole query is a single exchange: both windows and the
    // follow-on (user_id, session_seq) aggregate are satisfied by
    // the same hash(user_id) distribution (grouping on a superset of
    // the partitioning keys never re-shuffles), so at 100 TB the
    // event log ships exactly once and per-user width stays bounded
    // by that user's events. Time is exact integer micros
    // (ts_ns div 1000 — the w2/w4 discipline); (us, event_id) breaks
    // same-instant ties so session numbering is total and
    // engine-exact; money-style decimal sum keeps the per-session
    // value reduction order-independent.
    "w5_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      val gapUs = 1800L * 1000000L
      events(s, d)
        .withColumn("us", expr("ts_ns div 1000"))
        .select(col("user_id"), col("event_id"), col("value"), col("us"))
        .withColumn("is_new",
          when(lag(col("us"), 1).over(byUser).isNull ||
            col("us") - lag(col("us"), 1).over(byUser) > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_seq",
          sum(col("is_new")).over(byUser
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"),
          max(col("us")).as("end_us"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .withColumn("duration_us", col("end_us") - col("start_us"))
        .orderBy("user_id", "session_seq")
    })
  )

  val oracle: Map[String, String] = Map(
    "o1_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "o2_first_last" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CASE WHEN rn_first <= 10 THEN 'first' ELSE 'last' END AS which
        |FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_quantity)
        |      AS rn_first,
        |    row_number() OVER (ORDER BY l_orderkey DESC, l_linenumber DESC,
        |                       l_quantity DESC) AS rn_last
        |  FROM lineitem)
        |WHERE rn_first <= 10 OR rn_last <= 10
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "o3_union_dedupe" ->
      """SELECT DISTINCT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0)
        |ORDER BY o_custkey""".stripMargin,
    "w1_window_rank" ->
      """SELECT s_nationkey, s_suppkey, s_acctbal,
        |  row_number() OVER w AS rn,
        |  rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rnk,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,2)))
        |    OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_bal
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        |ORDER BY s_nationkey, rn""".stripMargin,
    "o6_zorder_layout" ->
      s"""WITH t AS (
         |  SELECT CAST(l_partkey % 256 AS BIGINT) AS a,
         |         CAST(l_suppkey % 256 AS BIGINT) AS b
         |  FROM lineitem),
         |z AS (SELECT a, b, $zInterleave AS z FROM t)
         |SELECT CAST(z >> 11 AS INT) AS tile, count(*) AS n_rows,
         |  min(a) AS a_min, max(a) AS a_max,
         |  min(b) AS b_min, max(b) AS b_max
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    "w2_event_rolling" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |    epoch_ns(ts) // 1000 AS us
        |  FROM events)
        |SELECT event_id, user_id,
        |  lag(value) OVER w AS prev_value,
        |  lead(event_type) OVER w AS next_type,
        |  us - lag(us) OVER w AS gap_us,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)))
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS mov_sum
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "w3_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us
        |  FROM events),
        |tv AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN us END) AS tv
        |  FROM e GROUP BY 1),
        |tc AS (
        |  SELECT e.user_id, min(us) AS tc
        |  FROM e JOIN tv USING (user_id)
        |  WHERE event_type = 'click' AND us > tv GROUP BY 1),
        |tp AS (
        |  SELECT e.user_id, min(us) AS tp
        |  FROM e JOIN tc USING (user_id)
        |  WHERE event_type = 'purchase' AND us > tc GROUP BY 1),
        |f AS (
        |  SELECT
        |    (SELECT count(*) FROM tv WHERE tv IS NOT NULL) AS users_view,
        |    (SELECT count(*) FROM tc) AS users_click,
        |    (SELECT count(*) FROM tp) AS users_purchase)
        |SELECT users_view, users_click, users_purchase,
        |  CASE WHEN users_view = 0 THEN NULL
        |       ELSE users_click * 1000000 // users_view END AS click_ppm,
        |  CASE WHEN users_view = 0 THEN NULL
        |       ELSE users_purchase * 1000000 // users_view END
        |    AS purchase_ppm
        |FROM f""".stripMargin,
    "w4_retention_cohort" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    epoch_ns(ts) // 86400000000000 AS day
        |  FROM events),
        |c AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN day END) AS cohort_day
        |  FROM e GROUP BY 1),
        |a AS (
        |  SELECT e.user_id, cohort_day, day
        |  FROM e JOIN c USING (user_id)
        |  WHERE cohort_day IS NOT NULL AND day >= cohort_day)
        |SELECT cohort_day // 7 AS cohort_week,
        |  (day - cohort_day) // 7 AS week_offset,
        |  count(DISTINCT user_id) AS active_users
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "w5_sessionize" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value, epoch_ns(ts) // 1000 AS us
        |  FROM events),
        |g AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                  OR us - lag(us) OVER w > 1800000000
        |             THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (
        |  SELECT *, CAST(sum(is_new) OVER (
        |      PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_seq
        |  FROM g)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  max(us) - min(us) AS duration_us
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
