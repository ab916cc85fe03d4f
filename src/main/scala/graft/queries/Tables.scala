package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Readers over the driver-provided synthetic tables (TESTDATA.md) plus shared
  * oracle-determinism helpers. */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.parquet carries INT64 TIMESTAMP(NANOS) which Spark refuses to
      // read natively; read nanos as long and derive a µs timestamp. DuckDB
      // (the oracle) truncates the same ns→µs, so `ets` matches its `ts`.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with `ets`: TimestampType(µs) derived from the raw nanos long via
    * integer division (never double division — 1.7e18 ns exceeds the 2^53
    * exact-integer range of Double). */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").withColumn("ets", timestamp_micros(expr("ts div 1000")))

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Recursive delete for the query-built scratch tables (one shared copy —
    * three query objects used to carry private clones that could drift). */
  private[queries] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Order-independent money sum: casting each double to DECIMAL(18,2) before
    * summing makes the aggregate exact (no float accumulation order effects),
    * so Spark and the DuckDB oracle produce bit-identical doubles. DuckDB
    * twin: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Same for 4-decimal intermediates (e.g. price*(1-discount)). */
  def dsum4(c: Column): Column = sum(c.cast(DecimalType(22, 4))).cast("double")
}
