package graft.tools

import org.apache.spark.sql.SparkSession
import graft.plans.AsOfJoin

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
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val trades = Seq((1L, 10L), (2L, 25L), (3L, 5L)).toDF("trade_id", "t")
    val quotes = Seq((9L, 1.0), (20L, 2.0)).toDF("t", "px")
    val df = AsOfJoin.backward(trades, quotes, Seq.empty, "t", Seq("px"))
    println("AQE OFF:")
    df.collect().foreach(println)
    println("rdd rows: " + df.rdd.collect().mkString(" | "))
    val df2 = AsOfJoin.backward(trades, quotes, Seq("t"), "t", Seq("px"))
    println("by=t: " + df2.collect().mkString(" | "))
    spark.stop()
  }
}
