package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows not dominated on a
  * (minimize, maximize) criterion pair — the "cheapest part of at least
  * this quality" query (Börzsönyi et al., "The Skyline Operator",
  * ICDE'01). The reference (tap-airbyte-wrapper) has no analytics
  * surface; this is a beyond-the-reference pipeline operator (data
  * selection under two competing scores, e.g. quality vs. length cutoffs
  * for a training corpus).
  *
  * Algorithm — sort-free of the quadratic dominance join: group rows by
  * the minimize value (one shuffle), take each group's max of the
  * maximize column, then one running max over the minimize-sorted group
  * table gives, for every row, the best maximize value among all
  * STRICTLY cheaper rows (`__amax`, rows-frame ending at -1) and within
  * its own price point (`__gmax`). A row is dominated iff a strictly
  * cheaper row matches-or-beats its maximize value (`__amax >= v`) or an
  * equal-minimize row strictly beats it (`__gmax > v`). Comparisons
  * only, zero arithmetic — doubles compare bit-identically cross-engine.
  *
  * Scale shape: the window runs over the DISTINCT minimize values (the
  * grouped table), not the input rows — |groups| is bounded by the value
  * domain. The single-partition window is the one concession at 100 TB;
  * the standard fix (range-partition the group table, per-partition
  * running max, broadcast the per-partition offsets) drops in without
  * changing this contract, exactly like a distributed prefix sum.
  */
object Skyline {

  /** Rows of `df` on the Pareto frontier of (minimize `minimizeCol`,
    * maximize `maximizeCol`). Duplicate criterion pairs are all kept
    * (classic skyline semantics: equal points do not dominate).
    *
    * Rows with a null in EITHER criterion are excluded up front — a null
    * score neither dominates nor competes. (Without the explicit filter
    * a null minimize value would sort first in the running-max window
    * and poison `__amax` for every real row.) NaN criteria are a
    * precondition violation, as in [[Stats.histogram]]: Spark orders
    * NaN largest, so a NaN minimize value would never be reported
    * dominated.
    */
  def skyline2d(df: DataFrame, minimizeCol: String, maximizeCol: String)
      : DataFrame = {
    val pts = df.filter(col(minimizeCol).isNotNull && col(maximizeCol).isNotNull)
    val perMin = pts.groupBy(col(minimizeCol))
      .agg(max(col(maximizeCol)).as("__gmax"))
    val w = Window.orderBy(col(minimizeCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = perMin.withColumn("__amax", max(col("__gmax")).over(w))
    pts.join(pref, Seq(minimizeCol))
      .filter(!(coalesce(col("__amax") >= col(maximizeCol), lit(false)) ||
        col("__gmax") > col(maximizeCol)))
      .drop("__gmax", "__amax")
  }
}
