package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  private def daily(rows: (String, String, java.lang.Double)*) = {
    spark.createDataFrame(rows).toDF("k", "d", "v")
      .select(col("k"), to_date(col("d")).as("day"), col("v"))
  }

  test("gapFillDaily completes the spine per key and carries the last value") {
    val df = daily(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-04", 4.0),
      ("b", "2024-02-10", 7.0))
    val out = TimeSeries.gapFillDaily(df, Seq("k"), "day", Seq("v"))
      .orderBy("k", "day").collect()
    // key a spans 4 days, key b spans 1 — per-key ranges, not the global one
    assert(out.length === 5)
    val a = out.filter(_.getString(0) == "a")
    assert(a.map(_.getDate(1).toString).toSeq ===
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    // v is null on gap days; v_filled carries 1.0 across them
    assert(a.map(r => Option(r.getAs[java.lang.Double]("v"))).toSeq ===
      Seq(Some(1.0), None, None, Some(4.0)))
    assert(a.map(_.getAs[Double]("v_filled")).toSeq === Seq(1.0, 1.0, 1.0, 4.0))
  }

  test("leading nulls stay null after the fill") {
    val df = daily(("a", "2024-01-01", null), ("a", "2024-01-03", 3.0))
    val out = TimeSeries.gapFillDaily(df, Seq("k"), "day", Seq("v"))
      .orderBy("day").collect()
    assert(out.map(r => Option(r.getAs[java.lang.Double]("v_filled"))).toSeq ===
      Seq(None, None, Some(3.0)))
  }
}
