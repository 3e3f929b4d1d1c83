package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loaders for the driver testdata tables.
  *
  * All queries go through here so scan-level concerns (nanosecond
  * timestamp compat, column pruning, future bucketing) are handled in
  * one place. At cluster scale these would be catalog tables; here they
  * are bare parquet files, one per table.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Plain parquet read. Filters/projections layered on top are pushed
    * into the scan by Catalyst (verify via explain: PushedFilters).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    }

  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS) which Spark's
    * vectorized reader rejects. Sessions are built (SparkUtil) with
    * spark.sql.legacy.parquet.nanosAsLong=true so the column arrives as
    * a nanos long; floor-divide to microseconds (matching DuckDB's
    * ns→µs coercion even for pre-1970 values — Spark `div` truncates
    * toward zero, so compensate when the remainder is negative).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "build the session via graft.SparkUtil (sets spark.sql.legacy.parquet.nanosAsLong)")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts",
        expr("timestamp_micros(ts div 1000 - (case when ts % 1000 < 0 then 1 else 0 end))"))
  }

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
