package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the trend-family skew bound (VERDICT r13 #5): mannKendall
  * and theilSenSlope pair-join on `keyCols` ALONE, so with K keys the
  * pair stage runs on ≤K tasks however many cores exist. By algebra
  * the pair table is |days|²/key — calendar-bounded — but the claim
  * deserves numbers: this times the daily ROLLUP (the data-sized
  * stage) against the full tests at {1,10}× day-span × {1,10}× key
  * cardinality over sf0.1 events (100 k rows, 5 types, 30 days at ×1).
  * If the fat-task pair time exceeded the rollup time at high day-
  * mult / low keys, the pair join would need day-bucket salting.
  *
  * Usage: `runMain graft.tools.ScaleTrend` (grid fixed).
  */
object ScaleTrend {

  private def timeIt(f: => Long): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def best(runs: Int)(f: => Long): Double =
    (1 to runs).map(_ => timeIt(f)).min

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for ((dm, km) <- Seq((1, 1), (10, 1), (1, 10), (10, 10))) {
      val dir = s"/tmp/graft_scale_trend_${dm}_$km/events.parquet"
      if (!new java.io.File(dir).exists()) {
        graft.Tables.events(spark, "/root/testdata/sf0.1")
          .withColumn("__d", explode(expr(s"sequence(0, ${dm - 1})")))
          .withColumn("__k", explode(expr(s"sequence(0, ${km - 1})")))
          .withColumn("ts", expr("timestampadd(DAY, __d * 30, ts)"))
          .withColumn("event_type",
            concat(col("event_type"), lit("_"), col("__k")))
          .drop("__d", "__k")
          .write.mode("overwrite").parquet(dir)
      }
      val ev = spark.read.parquet(dir)
      def daily = ev
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))

      val tRoll = best(3)(daily.agg(sum(col("n"))).collect()(0).getLong(0))
      var nPairs = 0L
      val tMk = best(3)({
        nPairs = graft.operators.TimeSeries
          .mannKendall(daily, Seq("event_type"), "day", "n")
          .agg(sum(col("n_pairs"))).collect()(0).getLong(0); nPairs })
      val tTs = best(3)(graft.operators.TimeSeries
        .theilSenSlope(daily, Seq("event_type"), "day", "n")
        .agg(sum(col("slope_scaled"))).collect()(0).getLong(0))
      println(f"days x$dm%-3d keys x$km%-3d rows=${100000L * dm * km}%9d " +
        f"pairs=$nPairs%9d  rollup=$tRoll%6.2fs  mk=$tMk%6.2fs  theilsen=$tTs%6.2fs")
    }
    spark.stop()
  }
}
