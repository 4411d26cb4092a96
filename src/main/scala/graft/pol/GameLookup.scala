package graft.pol

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Game lookup dimension (S5) + the reference's three-stage key
  * fallback (P5/J1, `etl/transform.py:199-215`):
  *
  *   stage 1: dim.Pool_id == pool_id               (exact)
  *   stage 2: dim.Pool_id == lstrip0(pool_id)      (file id de-zeroed)
  *   stage 3: zfill4(dim.Pool_id) == pool_id       (dim id zero-padded)
  *
  * Later stages apply only when every earlier stage found nothing, and
  * `min_bet` is the Bet of the FIRST matching dim row in workbook
  * order while `game_ids` collects all of them in order — so dim row
  * order is part of the semantics and is preserved via an explicit
  * `row_idx`.
  *
  * Spark-first: resolution happens per DISTINCT pool_id against the
  * broadcast dimension (both sides tiny), producing a resolved lookup
  * that facts broadcast-join on a plain equi-key. The fact side is
  * touched exactly once and never widens — correct at any scale.
  */
object GameLookup {

  /** Normalize a raw header-named dimension frame (all-string columns
    * Game, Game_id, Pool_id, Bet [, Max_win_factor]) to the resolved
    * schema. `row_idx` pins workbook row order (single partition →
    * encounter order).
    */
  private def normalize(raw: DataFrame): DataFrame = {
    val df = raw.coalesce(1)
    val withMwf =
      if (df.columns.contains("Max_win_factor")) df
      else df.withColumn("Max_win_factor", lit(null).cast("string"))
    withMwf.select(
      col("Game").as("game"),
      col("Game_id").cast("string").as("game_id"),
      col("Pool_id").cast("string").as("pool_id_dim"),
      col("Bet").cast("double").as("bet"),
      col("Max_win_factor").cast("double").as("max_win_factor"),
      monotonically_increasing_id().as("row_idx"))
  }

  /** Load the dimension from a CSV fixture (offline stand-in for the
    * xlsx, SURVEY §1.2).
    */
  def fromCsv(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read.option("header", "true").csv(path))

  /** Load the dimension straight from the reference's `.xlsx` workbook
    * (S5: `etl/transform.py:27-58` loads `game_id_to_pools.xlsx`).
    * xlsx is a zip of XML — this is a dependency-free driver-side
    * reader (java.util.zip + the JDK's StAX), which is the right scale
    * shape: the dimension is a handful of rows that the join side
    * broadcasts; the FACT side never touches this path. Handles shared
    * strings, inline strings and numeric cells; numeric cell text is
    * kept verbatim, so integer ids stay "6371", never "6371.0".
    */
  def fromXlsx(spark: SparkSession, path: String): DataFrame = {
    val rows = Xlsx.readRows(path)
    require(rows.nonEmpty, s"empty worksheet in $path")
    val header = rows.head.map(h => Option(h).getOrElse(""))
    val schema = org.apache.spark.sql.types.StructType(header.map(
      org.apache.spark.sql.types.StructField(_,
        org.apache.spark.sql.types.StringType, nullable = true)))
    val data = rows.tail.map { r =>
      org.apache.spark.sql.Row.fromSeq(
        header.indices.map(i => if (i < r.length) r(i) else null))
    }
    import scala.jdk.CollectionConverters._
    normalize(spark.createDataFrame(data.asJava, schema))
  }

  /** Load the dimension from either artifact kind by extension — the
    * reference's own `game_id_to_pools.xlsx` works directly, a CSV
    * export works identically.
    */
  def load(spark: SparkSession, path: String): DataFrame =
    if (path.toLowerCase.endsWith(".xlsx")) fromXlsx(spark, path)
    else fromCsv(spark, path)

  /** The reference's workbook discovery (`etl/transform.py:43-47`):
    * probe `<root>/`, `<root>/config/`, `<root>/data/` in order and
    * load the first `game_id_to_pools` artifact found (.xlsx exactly
    * as the reference; a .csv export of the same name also resolves).
    */
  def loadFromRoot(spark: SparkSession, repoRoot: String): DataFrame = {
    val candidates = for {
      dir <- Seq("", "config/", "data/")
      name <- Seq("game_id_to_pools.xlsx", "game_id_to_pools.csv")
    } yield s"$repoRoot/$dir$name"
    candidates.find(p => new java.io.File(p).isFile) match {
      case Some(p) => load(spark, p)
      case None => sys.error("game_id_to_pools workbook not found; " +
        s"probed: ${candidates.mkString(", ")}")
    }
  }

  /** `lstrip('0') or '0'` (trap #6 in SURVEY §7). */
  def strip0(c: Column): Column = {
    val s = regexp_replace(c, "^0+", "")
    when(s === "", "0").otherwise(s)
  }

  /** Resolve each distinct pool_id of `poolIds` against the dimension
    * with the staged fallback. Output columns: pool_id, min_bet,
    * game_ids (workbook order), max_win_factor. Pool ids with no match
    * are absent (callers left-join → the reference's null ladder).
    */
  def resolved(dim: DataFrame, poolIds: DataFrame): DataFrame = {
    val d = dim.select(
      col("pool_id_dim"), col("game_id"), col("bet"),
      col("max_win_factor"), col("row_idx"))
    val p = poolIds.select(col("pool_id"))
      .where(col("pool_id").isNotNull).distinct()
    // zfill4, not lpad: Python zfill never truncates, Spark lpad does —
    // a dim id like '50001234' must not collapse to '5000' (stage 3
    // only ever pads SHORTER ids).
    val zfill4 = when(length(col("pool_id_dim")) < 4,
      lpad(col("pool_id_dim"), 4, "0")).otherwise(col("pool_id_dim"))
    // Each stage is a plain EQUI-join on a derived key (hash/broadcast
    // join, never a nested-loop over ids×dim — the disjunctive-
    // condition formulation degrades to BroadcastNestedLoop, which
    // stops scaling the moment either side grows).
    def stageJoin(n: Int, probeKey: Column, dimKey: Column): DataFrame =
      p.join(broadcast(d.withColumn("__k", dimKey)),
          probeKey === col("__k"), "inner")
        .withColumn("__stage", lit(n))
        .drop("__k")
    val cand = stageJoin(1, col("pool_id"), col("pool_id_dim"))
      .unionByName(stageJoin(2, strip0(col("pool_id")), col("pool_id_dim")))
      .unionByName(stageJoin(3, col("pool_id"), zfill4))
    val best = cand.groupBy("pool_id").agg(min(col("__stage")).as("__best"))
    cand.join(broadcast(best), Seq("pool_id"))
      .where(col("__stage") === col("__best"))
      // a dim row can satisfy several stages of the same pool; the
      // winning stage's rows are deduped by identity before collecting
      .dropDuplicates("pool_id", "row_idx")
      .groupBy("pool_id")
      .agg(
        min_by(col("bet"), col("row_idx")).as("min_bet"),
        transform(
          array_sort(collect_list(struct(col("row_idx"), col("game_id")))),
          x => x.getField("game_id")).as("game_ids"),
        min_by(col("max_win_factor"), col("row_idx")).as("max_win_factor"))
  }
}
