package graft.tools

import org.apache.spark.sql.SparkSession

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
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    ev.printSchema()
    ev.select("event_id", "ts").orderBy("event_id").show(3, false)
    ev.selectExpr("min(ts)", "max(ts)").show(false)
    spark.stop()
  }
}
