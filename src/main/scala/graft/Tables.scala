package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every operator in the library takes DataFrames, not paths — these
  * helpers are the only place that knows the on-disk layout, so a real
  * deployment can swap them for catalog tables / object-store URIs
  * without touching operator code.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Hash-spread a DataFrame across the configured shuffle parallelism
    * before CPU-heavy per-row work. The partition count is explicit on
    * purpose: a bare repartition(col) is an AQE-optimizable hint that
    * gets coalesced back to ~1 partition when the *bytes* are small,
    * even though the *compute* per row is the bottleneck (tiny local
    * files are one row group = one task otherwise).
    */
  def spread(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.repartition(n, key)
  }

  /** Typed-Dataset variant of spread (round-robin). */
  def spreadN[T](ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] = {
    val n = ds.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    ds.repartition(n)
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (microsecond) cannot represent natively — read it as raw long nanos
    * (legacy conf) and truncate to microseconds with integer arithmetic
    * (`div`, not `/`: ns since epoch exceeds 2^53, double division would
    * lose precision).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
