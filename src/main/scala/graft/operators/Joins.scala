package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark's API lacks, composed from built-ins so Catalyst
  * keeps planning them (preference (a) of the build brief: compose existing
  * ops when the semantics allow — a custom SparkPlan would forfeit AQE,
  * codegen and skew handling for no gain here).
  */
object Joins {

  /** Backward as-of join: for every left row, attach the single right row
    * with the LARGEST right.on <= left.on within the same `by` key (the
    * classic trades⋈quotes operation; DuckDB `ASOF JOIN`, pandas
    * `merge_asof`).
    *
    * Implementation (union + window, no custom physical operator): tag and
    * union both sides, hash-shuffle ONCE on `by`, sort each partition by
    * (on, tag), then `last(right_col, ignoreNulls)` over the running window
    * carries the most recent right values onto each left row.
    *
    * Scale shape: one shuffle of (|L|+|R|) rows on the by-key + one sorted
    * window pass — the same cost profile as a sort-merge join, with skew
    * handled by AQE like any other exchange. No broadcast requirement on
    * either side.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      on: String,
      rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // All right value columns travel as ONE struct so the carried values
    // always come from the SAME right row — per-column last(...) would
    // blend columns from different right rows whenever a right value is
    // null (DuckDB/pandas ASOF attach the latest row including its nulls).
    val rvStruct = org.apache.spark.sql.types.StructType(
      rightValueCols.map(c => right.schema(c)))
    // tag=1 for left so that at equal `on` values the right row sorts first
    // and IS visible to the left row (inclusive <=, matching ASOF semantics)
    val l = left.select(
      leftCols.map(col) ++
        Seq(lit(null).cast(rvStruct).as("__rvals"),
          lit(1).as("__tag"), col(on).as("__on")): _*)
    val r = right.select(
      leftCols.map(c =>
        if (by.contains(c)) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(rightValueCols.map(col): _*).as("__rvals"),
          lit(0).as("__tag"), col(on).as("__on")): _*)

    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__on").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val carried = l.unionByName(r)
      .withColumn("__rvals", last(col("__rvals"), ignoreNulls = true).over(w))
    carried.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        rightValueCols.map(c => col(s"__rvals.$c").as(c)): _*)
  }

  /** Range (interval) join: left rows matched to right intervals
    * `[startCol, endCol]` containing `pointCol`, executed as an EQUI-join.
    *
    * Naive `a.join(b, a.p between b.s and b.e)` plans as a broadcast/
    * cartesian nested-loop — quadratic at scale. Instead both sides are
    * mapped onto coarse buckets of width `bucketWidth`: points get ONE
    * bucket, intervals explode to every covered bucket (cheap while
    * `bucketWidth` ≈ typical interval length), the equi-join on bucket id
    * shuffles hash-partitioned, and the exact range predicate filters
    * residually. Interval containment of point p ⇒ bucket(p) is covered, so
    * no matches are lost.
    */
  def rangeJoinBucketed(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      joinType: String = "inner"): DataFrame = {
    require(bucketWidth > 0)
    // numeric columns bucket directly; timestamp/date columns via epoch
    // seconds (ANSI mode forbids a direct timestamp -> long cast)
    def epoch(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.TimestampNTZType |
          org.apache.spark.sql.types.DateType =>
        unix_timestamp(col(c).cast("timestamp"))
      case _ => col(c).cast("long")
    }
    val p = points.withColumn("__bucket", (epoch(points, pointCol) / bucketWidth).cast("long"))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        (epoch(intervals, startCol) / bucketWidth).cast("long"),
        (epoch(intervals, endCol) / bucketWidth).cast("long"))))
    p.join(i, Seq("__bucket"), joinType)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
