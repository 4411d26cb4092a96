package graft.pol

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A9 — the declared rich per-file statistics surface
  * (`README.md:66-103`, consumed by the dead-code sinks
  * `etl/load.py:137-141,199-209`): per-file summary stats
  * (total/sum/min/max/avg/median/stddev/unique_types), per-type-code
  * breakdown with percentages, a bucketed value histogram, and
  * first-10/last-10 sample rows in file order.
  *
  * Line order note: Spark's text source preserves intra-split row
  * order and `monotonically_increasing_id` is monotone in
  * (partition, row) — for files read in path order (splits are
  * offset-ordered within a file) a per-file `row_number` over the id
  * reconstructs file line order. [[PolParser.parse]] keeps no id, so
  * callers wanting samples should parse with [[withLineNumbers]].
  */
object RichStats {

  /** Re-derive per-file line numbers from read order. */
  def withLineNumbers(parsed: DataFrame): DataFrame = {
    val w = Window.partitionBy("relative_path")
      .orderBy("__mid")
    parsed.withColumn("__mid", monotonically_increasing_id())
      .withColumn("line_no", row_number().over(w))
      .drop("__mid")
  }

  /** Per-file summary stats. */
  def perFile(parsed: DataFrame): DataFrame =
    parsed.groupBy("relative_path")
      .agg(
        count(lit(1)).as("total_values"),
        sum(col("game_win")).as("sum"),
        min(col("game_win")).as("min"),
        max(col("game_win")).as("max"),
        bround(avg(col("game_win")), 2).as("avg"),
        median(col("game_win")).as("median"),
        bround(stddev_samp(col("game_win")), 2).as("std_dev"),
        countDistinct(col("type_code")).as("unique_types"))
      .orderBy("relative_path")

  /** Per-type-code stats with percentage of file rows. */
  def perType(parsed: DataFrame): DataFrame = {
    val fileTotals = parsed.groupBy("relative_path")
      .agg(count(lit(1)).as("__file_n"))
    parsed.groupBy("relative_path", "type_code")
      .agg(
        count(lit(1)).as("count"),
        sum(col("game_win")).as("sum"),
        min(col("game_win")).as("min"),
        max(col("game_win")).as("max"),
        bround(avg(col("game_win")), 2).as("avg"))
      .join(fileTotals, "relative_path")
      .withColumn("pct", bround(col("count") / col("__file_n") * 100, 2))
      .drop("__file_n")
      .orderBy("relative_path", "type_code")
  }

  /** Bucketed value histogram with percentages (width `bucketWidth`). */
  def histogram(parsed: DataFrame, bucketWidth: Long = 100L): DataFrame = {
    val fileTotals = parsed.groupBy("relative_path")
      .agg(count(lit(1)).as("__file_n"))
    parsed
      .withColumn("bucket", floor(col("game_win") / bucketWidth) * bucketWidth)
      .groupBy("relative_path", "bucket")
      .agg(count(lit(1)).as("count"))
      .join(fileTotals, "relative_path")
      .withColumn("pct", bround(col("count") / col("__file_n") * 100, 2))
      .drop("__file_n")
      .orderBy("relative_path", "bucket")
  }

  /** First-10 and last-10 rows per file in line order. */
  def samples(parsedWithLines: DataFrame, k: Int = 10): DataFrame = {
    val byFile = Window.partitionBy("relative_path")
    val asc = byFile.orderBy(col("line_no"))
    val desc = byFile.orderBy(col("line_no").desc)
    parsedWithLines
      .withColumn("__rf", row_number().over(asc))
      .withColumn("__rl", row_number().over(desc))
      .where(col("__rf") <= k || col("__rl") <= k)
      .select(col("relative_path"), col("line_no"), col("game_win"),
        col("type_code"),
        when(col("__rf") <= k, lit("first")).otherwise(lit("last")).as("which"))
      .orderBy("relative_path", "line_no")
  }
}
