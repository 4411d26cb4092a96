package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory and read one parquet per
  * table. Reading through here (rather than ad-hoc paths) keeps the
  * scan declarative so Catalyst can push filters/column pruning into
  * the parquet reader.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** The events table carries TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects by default; read the raw nanos as LONG and convert
    * to a microsecond TIMESTAMP (`ts`), keeping the exact nanos in
    * `ts_ns`. Oracles must truncate to microseconds the same way
    * (`make_timestamp(epoch_ns(ts) // 1000)` in DuckDB).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      // integer `div`, not `/`: the raw nanos exceed 2^53, so a double
      // division is 1 µs off on some epochs while the oracle's
      // epoch_ns(ts) // 1000 floors exactly
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
