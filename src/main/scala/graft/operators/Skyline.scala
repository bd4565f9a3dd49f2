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
  * Scale shape: the running max runs over the DISTINCT minimize values
  * (the grouped table), not the input rows — and since r10 it goes
  * through [[PrefixSum.runningMax]] (range-bucketed local running max +
  * broadcast per-bucket offsets), so NO single-partition window remains
  * even when every criterion value is distinct.
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
    // exclusive prefix-max over the distinct minimize values via the
    // DISTRIBUTED two-pass running max (r10) — no single-partition
    // window even when every criterion value is distinct. minimizeCol
    // is unique here by construction (it is the groupBy key), which the
    // exclusive frame requires.
    val pref = PrefixSum
      .runningMax(perMin, minimizeCol, "__gmax", numRanges = 8, exclusive = true)
      .withColumnRenamed("runmax___gmax", "__amax")
    pts.join(pref, Seq(minimizeCol))
      .filter(!(coalesce(col("__amax") >= col(maximizeCol), lit(false)) ||
        col("__gmax") > col(maximizeCol)))
      .drop("__gmax", "__amax")
  }
}
