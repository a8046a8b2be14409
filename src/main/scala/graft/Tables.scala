package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided star-schema parquet tables
  * (TESTDATA.md). Schema comes from parquet footers; filters and
  * projections applied downstream push into the scan (checked via
  * `.explain` in GraftPlanSpec).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which the
    * vectorized Parquet reader rejects; read nanos as long and convert
    * to a microsecond TimestampType column (truncation — safe: the
    * generated data is microsecond-granular). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    // integer `div`, not `/`: epoch-nanos (~1.7e18) exceeds double's
    // 2^53 exact range, so float division would corrupt the low bits
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
