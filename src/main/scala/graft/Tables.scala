package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Uniform access to the driver testdata tables.
  *
  * `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's parquet
  * reader rejects outright ([PARQUET_TYPE_ILLEGAL]); we read it with
  * `spark.sql.legacy.parquet.nanosAsLong=true` and rebuild `ts` as
  * TimestampType via integral `DIV 1000` (ns → µs, truncation — the same
  * conversion DuckDB applies when it narrows ns to its µs timestamps, so
  * oracle comparisons agree). Integer division matters: ns-epoch values
  * (~1.7e18) exceed 2^53 and would lose precision through a double.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    case _ => spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame    = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
