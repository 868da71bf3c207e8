package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Reading through this one
  * seam keeps schema assumptions in a single place and lets us attach
  * per-table read options (e.g. partition-size tuning) later without
  * touching every operator.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark 4 rejects
    * outright. Read nanos as long (legacy escape hatch) and convert to a
    * microsecond timestamp — the data is microsecond-aligned, so the
    * div-1000 is lossless. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(spark, sfDir, "events"))
  }

  /** ts: long (epoch nanos) or TIMESTAMP_NTZ -> ts: timestamp, if needed
    * (no-op otherwise). The NTZ arm covers generator versions that write
    * timestamp[us] with isAdjustedToUTC=false, which Spark 4 infers as
    * TIMESTAMP_NTZ; sessions pin spark.sql.session.timeZone=UTC, so the
    * wall-clock reinterpretation is the identity on the stored micros. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
      df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    else df
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
