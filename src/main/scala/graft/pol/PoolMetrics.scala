package graft.pol

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-pool gambling-math metrics and classification — the semantic
  * core of the reference engine.
  *
  * Reference semantics (all byte-verified against the golden outputs,
  * SURVEY.md preamble):
  *   - P2 filename decode (`etl/transform.py:181-186`)
  *   - P3 classification (`etl/transform.py:130-162`)
  *   - A1–A6 metrics (`etl/transform.py:98-127, 190-228`):
  *       rtp  = round(sum/(n*bet)*100, 2)                 [half-even]
  *       hit  = round(count(win>0)/n*100, 2)              [half-even]
  *       vol  = round(1.645*sqrt(Σ round(freq·(w/bet − rtp/100)², 4)), 2)
  *     with the traps: vol consumes the ALREADY-ROUNDED rtp, and each
  *     variance term is rounded to 4dp BEFORE summing.
  *
  * Rounding is `bround` (HALF_EVEN) to match Python/numpy. The rounded
  * 4dp variance terms are summed as DECIMAL(18,4), which makes the
  * reference's round-then-sum order exact AND order-independent — the
  * property that lets partial aggregation combine in any order on a
  * cluster without drifting from the single-threaded pandas result.
  *
  * Shuffle shape at scale: the raw fact stream is aggregated ONCE by
  * (file, win) with map-side combine — the only wide shuffle over the
  * full data. Everything after operates on the per-file win histogram
  * (~330 rows/file observed), so a 100 TB corpus reduces to
  * |files|·|distinct wins| rows after stage one.
  */
object PoolMetrics {

  /** P2: `Pool_0201_395.pol` → (pool_id "0201", pool_type "395").
    * Mirrors `name.replace('.pol','').split('_')` with positional null
    * safety (get() is null out-of-range).
    */
  def decodeFilename(fileName: Column): (Column, Column) = {
    val parts = split(regexp_replace(fileName, "\\.pol", ""), "_")
    (get(parts, lit(1)), get(parts, lit(2)))
  }

  /** P3: classification truth table. tag is `['GAB','PFB']` for exactly
    * '395'; `['PFB']` for 5-prefixed codes longer than 4; else
    * `['REG']`; null pool_type degrades to scalar 'UNKNOWN' — modeled
    * as a single-element array plus [[tagIsScalar]] for the JSON writer.
    * Flat detection is independent: 4-prefixed codes longer than 4 set
    * is_flat=1 and take the last 4 chars as max_multiplier.
    */
  def classify(poolType: Column): (Column, Column, Column) = {
    val tag = when(poolType.isNull, array(lit("UNKNOWN")))
      .when(poolType === "395", array(lit("GAB"), lit("PFB")))
      .when(length(poolType) > 4 && poolType.startsWith("5"), array(lit("PFB")))
      .otherwise(array(lit("REG")))
    val isFlat = when(poolType.isNotNull && length(poolType) > 4 &&
      poolType.startsWith("4"), 1).otherwise(0)
    val maxMultiplier = when(poolType.isNotNull && length(poolType) > 4 &&
      poolType.startsWith("4"), substring(poolType, -4, 4))
    (tag, isFlat, maxMultiplier)
  }

  def tagIsScalar(poolType: Column): Column = poolType.isNull

  /** Full per-pool metric computation from parsed fact rows.
    *
    * @param parsed output of [[PolParser.parse]]
    * @param dim    output of [[GameLookup.fromCsv]]
    * @param files  optional file inventory ([[PolParser.listFiles]]):
    *               when given, files with NO parsed rows (0-byte, or
    *               every line unparseable) still emit a size-0 row with
    *               null metrics — the reference builds a document for
    *               every DISCOVERED file and counts it in the summary,
    *               not just for files that parsed.
    * @return one row per file: identity, lookup fields, rtp/volatility/
    *         hit_frequency, classification, size
    */
  def perPool(parsed: DataFrame, dim: DataFrame,
      files: Option[DataFrame] = None): DataFrame = {
    // Stage 1 — the one wide shuffle: per-file win histogram, map-side
    // combined (hash agg on integral keys, fully codegen'd).
    val hist = parsed
      .groupBy(col("relative_path"), col("game_win"))
      .agg(
        count(lit(1)).as("cnt"),
        first(col("file_name"), ignoreNulls = true).as("file_name"),
        first(col("folder_path"), ignoreNulls = true).as("folder_path"),
        first(col("parent_folder"), ignoreNulls = true).as("parent_folder"))

    // Stage 2 — per-file scalars from the histogram (tiny).
    val parsedPools = hist.groupBy(col("relative_path"))
      .agg(
        sum(col("cnt")).as("size"),
        sum(col("game_win") * col("cnt")).as("total_win"),
        sum(when(col("game_win") > 0, col("cnt")).otherwise(0L)).as("hits"),
        first(col("file_name")).as("file_name"),
        first(col("folder_path")).as("folder_path"),
        first(col("parent_folder")).as("parent_folder"))
    // Inventory merge: every discovered file keeps a row; files absent
    // from the parsed stream get size=0 (→ null rtp/hit/vol below).
    val pool0 = files match {
      case Some(f) =>
        f.select("relative_path", "file_name", "folder_path", "parent_folder")
          .join(parsedPools.drop("file_name", "folder_path", "parent_folder"),
            Seq("relative_path"), "left")
          .na.fill(0L, Seq("size", "total_win", "hits"))
      case None => parsedPools
    }
    val (poolId, poolType) = decodeFilename(col("file_name"))
    val pool1 = pool0
      .withColumn("pool_id", poolId)
      .withColumn("pool_type", poolType)

    // Lookup join: resolve distinct pool ids against the broadcast dim,
    // then broadcast the (tiny) resolved map back onto the per-file rows.
    val lk = GameLookup.resolved(dim, pool1.select(col("pool_id")))
    val pool2 = pool1.join(broadcast(lk), Seq("pool_id"), "left")

    val haveBet = col("min_bet").isNotNull && col("min_bet") > 0 && col("size") > 0
    val pool3 = pool2
      .withColumn("rtp",
        when(haveBet, bround(col("total_win") / (col("size") * col("min_bet")) * 100, 2)))
      .withColumn("hit_frequency",
        when(haveBet, bround(col("hits") / col("size") * 100, 2)))

    // Stage 3 — volatility from the histogram + the per-file scalars:
    // round each variance term to 4dp, sum exactly as DECIMAL(18,4).
    val varTerms = hist
      .join(pool3.select(
        col("relative_path"), col("min_bet"), col("rtp"), col("size").as("__n")),
        Seq("relative_path"))
      .where(col("min_bet").isNotNull && col("min_bet") > 0 && col("__n") > 0)
      .select(col("relative_path"),
        bround((col("cnt") / col("__n")) *
          pow(col("game_win") / col("min_bet") - col("rtp") / 100, 2), 4)
          .cast("decimal(28,4)").as("var_term"))
    val vol = varTerms.groupBy(col("relative_path"))
      .agg(bround(lit(1.645) * sqrt(sum(col("var_term")).cast("double")), 2)
        .as("volatility"))

    val (tag, isFlat, maxMult) = classify(col("pool_type"))
    pool3.join(vol, Seq("relative_path"), "left")
      .withColumn("tag", tag)
      .withColumn("tag_is_scalar", tagIsScalar(col("pool_type")))
      .withColumn("is_flat", isFlat)
      .withColumn("max_multiplier", maxMult)
  }

  /** One-pass variant of [[perPool]] built on the custom
    * [[graft.functions.VolatilityAgg]] aggregator: bet is broadcast-
    * joined onto the raw rows, then a single shuffle of bounded
    * histogram buffers produces every metric (same bit-exact rounding —
    * see FunctionsSpec). Preferable when the cluster is shuffle-bound;
    * the expression pipeline remains the default (fully codegen'd, no
    * kryo buffers).
    */
  def perPoolOnePass(parsed: DataFrame, dim: DataFrame): DataFrame = {
    val (poolId, poolType) = decodeFilename(col("file_name"))
    val withId = parsed.withColumn("pool_id", poolId)
    val lk = GameLookup.resolved(dim, withId.select(col("pool_id")))
    val m = graft.functions.VolatilityAgg.metrics
    withId
      .join(broadcast(lk), Seq("pool_id"), "left")
      .groupBy(col("relative_path"))
      .agg(
        m(col("game_win"), col("min_bet")).as("m"),
        first(col("file_name")).as("file_name"),
        first(col("pool_id")).as("pool_id"),
        first(col("min_bet")).as("min_bet"),
        first(col("folder_path")).as("folder_path"))
      .select(col("relative_path"), col("file_name"), col("pool_id"),
        col("min_bet"), col("folder_path"),
        col("m.size").as("size"),
        col("m.total_win").as("total_win"),
        col("m.hits").as("hits"),
        col("m.rtp").as("rtp"),
        col("m.hit_frequency").as("hit_frequency"),
        col("m.volatility").as("volatility"))
  }

  /** Assemble the nested per-pool document (SURVEY §1.4 shape).
    * `processedAt` is injectable so golden tests can freeze the clock
    * (trap #7); pass None for wall-clock UTC seconds.
    */
  def documents(pools: DataFrame, processedAt: Option[String] = None): DataFrame = {
    val ts = processedAt
      .map(lit)
      .getOrElse(date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssxxx"))
    pools.select(
      col("file_name").as("pool_name"),
      col("pool_id"),
      col("pool_type"),
      coalesce(col("game_ids"), array().cast("array<string>")).as("game_ids"),
      col("min_bet"),
      col("rtp"),
      col("volatility"),
      col("is_flat"),
      col("tag"),
      col("tag_is_scalar"),
      col("size"),
      col("max_multiplier"),
      col("max_win_factor"),
      struct(
        col("relative_path").as("source_file"),
        col("file_name"),
        col("folder_path"),
        ts.as("processed_at"),
        col("hit_frequency")).as("metadata"))
  }
}
