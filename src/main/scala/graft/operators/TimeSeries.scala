package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: complete a per-key date spine and carry
  * values across the gaps — the resample/ffill operation every metrics or
  * feature pipeline runs before windowed training (pandas `resample().
  * ffill()`, QuestDB/Timescale `SAMPLE BY ... FILL(PREVIOUS)`).
  *
  * The reference (tap-airbyte-wrapper) has no time-series surface; this is
  * part of the beyond-the-reference pipeline operators the build brief
  * asks for.
  *
  * Scale shape: the spine is generated per key from that key's own
  * [min, max] range (one partial+final agg shuffle on the keys), so a
  * short-lived key never fabricates rows across the corpus' full history —
  * row growth is bounded by sum over keys of that key's span, not
  * n_keys × global_span. The explode is narrow; the left join hash-joins
  * on (keys, date); the forward fill is one window pass partitioned by the
  * keys. Nothing collects to the driver and no state grows with corpus
  * size. At 100 TB the three exchanges (agg, join, window) are the whole
  * cost; AQE coalesces/splits them like any other shuffle.
  */
object TimeSeries {

  /** Fill `df` (one row per (keyCols, dateCol) — enforce upstream) to a
    * complete per-key daily spine; each column in `fillCols` gains a
    * `<col>_filled` companion carrying the last non-null value at or
    * before the row's date (leading gaps stay null).
    */
  def gapFillDaily(
      df: DataFrame,
      keyCols: Seq[String],
      dateCol: String,
      fillCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val spine = df.groupBy(keys: _*)
      .agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
      .select(keys :+ explode(sequence(col("__lo"), col("__hi"),
        expr("interval 1 day"))).as(dateCol): _*)
    val joined = spine.join(df, keyCols :+ dateCol, "left")
    val w = Window.partitionBy(keys: _*).orderBy(col(dateCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Interval-concurrency sweep line: for every day on which the open
    * set changes, the number of [start, end) intervals covering it —
    * max-concurrent-sessions / open-orders / live-connections, computed
    * without a row-per-covered-day explosion or an interval self-join.
    *
    * Each interval contributes +1 on its start day and -1 on its
    * (exclusive) end day; one aggregate collapses the deltas per day
    * (the only data-sized shuffle), and a running sum over the
    * day-grained net table yields the concurrency. Integer arithmetic
    * end to end. The window runs over DISTINCT change days — bounded by
    * the calendar, not the row count; at 100 TB the same
    * range-partitioned prefix-sum refit as [[Skyline.skyline2d]]
    * applies.
    */
  def intervalConcurrency(df: DataFrame, startCol: String, endCol: String)
      : DataFrame = {
    // Both deltas come from ONE pass over the input (explode of a 2-row
    // struct array) — a unionAll of two selects would execute the whole
    // upstream plan twice. Null-dated intervals are excluded up front:
    // an open-ended interval must be closed upstream (coalesce the end
    // to a horizon date), otherwise its -1 would land in a null day
    // group that sorts first and understates every real day's count.
    val deltas = df
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(explode(array(
        struct(to_date(col(startCol)).as("day"), lit(1L).as("delta")),
        struct(to_date(col(endCol)).as("day"), lit(-1L).as("delta")))).as("d"))
      .groupBy(col("d.day").as("day")).agg(sum(col("d.delta")).as("__net"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("n_open", sum(col("__net")).over(w))
      .select(col("day"), col("n_open"))
  }
}
