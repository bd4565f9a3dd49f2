package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Ad-hoc local experimentation entry point (not part of the engine). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val dec = DecimalType(18, 2)
    val base = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(dec)).as("s"))

    base.select(col("event_type"), col("n"),
        col("s").cast(DecimalType(38, 2)).as("sum_value"))
      .orderBy("event_type")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/demux_382")

    base.select(col("event_type"), col("n"),
        col("s").cast(DecimalType(38, 4)).as("sum_value"))
      .orderBy("event_type")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/demux_384")

    base.select(col("event_type"), col("n"),
        col("s").cast("double").as("sum_value"))
      .orderBy("event_type")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/demux_dbl")

    spark.stop()
  }
}
