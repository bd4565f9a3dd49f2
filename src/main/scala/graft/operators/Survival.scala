package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation (Kaplan & Meier 1958, "Nonparametric
  * estimation from incomplete observations") — the right-censoring-aware
  * retention/churn curve every lifecycle analysis runs where a naive
  * "fraction still active after t days" would treat still-active users
  * as churned. Beyond-the-reference analytics surface alongside
  * [[TimeSeries]] and [[Stats]].
  *
  * Determinism contract: the life table (event/censor counts and the
  * at-risk ladder) is pure integer arithmetic; the survival curve
  * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) is a SEQUENTIAL IEEE fold in ascending
  * time order — each prefix recomputed as `aggregate(slice(...))` from
  * 1.0D, so any engine replaying the identical
  * divide→subtract→multiply sequence (DuckDB: `list_reduce` over the
  * same prefix) reproduces every double bit-for-bit. Never a
  * float-aggregate reordering: the product is order-fixed by
  * construction, the [[TimeSeries.ewmaDyadic]] discipline applied to a
  * product instead of a sum.
  *
  * 100 TB shape: one shuffle collapses subjects to the life table
  * (duration, d, c) — calendar-sized, NOT corpus-sized; the at-risk
  * ladder and the fold then run on that spine. The single-partition
  * window + one-row collect are bounded BY SEMANTICS (distinct
  * durations — days/weeks, ≤ thousands), the documented
  * bounded-single-partition exception (q_skyline/q_curriculum class).
  * The O(T²) prefix refold is deliberate: T is calendar-sized, and the
  * refold keeps every prefix independently replayable.
  */
object Survival {

  /** Life table + survival curve over per-subject `(durationCol,
    * observedCol)` rows (duration: integer time units; observed: true =
    * the event happened at `duration`, false = censored at `duration`).
    * Result, one row per distinct duration ascending: `(t, n_risk, d,
    * c, survival)`.
    */
  def kaplanMeier(
      df: DataFrame,
      durationCol: String,
      observedCol: String): DataFrame = {
    val perT = df
      .select(col(durationCol).cast("long").as("t"),
        col(observedCol).cast("boolean").as("obs"))
      .groupBy(col("t"))
      .agg(sum(when(col("obs"), 1L).otherwise(0L)).as("d"),
        sum(when(col("obs"), 0L).otherwise(1L)).as("c"))
    // at-risk at t = everyone whose duration is >= t: suffix-sum the
    // (d + c) ladder — single-partition BY SEMANTICS (calendar-sized)
    val w = Window.orderBy(col("t").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risk = perT.withColumn("n_risk", sum(col("d") + col("c")).over(w))
    risk
      .agg(sort_array(collect_list(
        struct(col("t"), col("d"), col("c"), col("n_risk")))).as("a"))
      .select(explode(expr(
        """transform(a, (x, i) -> named_struct(
             't', x.t, 'n_risk', x.n_risk, 'd', x.d, 'c', x.c,
             'survival', aggregate(slice(a, 1, i + 1), 1.0D,
               (acc, y) -> acc * (1.0D - CAST(y.d AS DOUBLE)
                                       / CAST(y.n_risk AS DOUBLE)))))"""))
        .as("r"))
      .select(col("r.t").as("t"), col("r.n_risk").as("n_risk"),
        col("r.d").as("d"), col("r.c").as("c"),
        col("r.survival").as("survival"))
  }

  /** Nelson–Aalen cumulative hazard over the same per-subject
    * `(durationCol, observedCol)` rows: Ĥ(t) = Σ_{t'≤t} d/n_risk. Where
    * [[kaplanMeier]]'s survival is a sequential PRODUCT (hence the array
    * refold), the hazard is a plain SUM — each term floors to an exact
    * per-mille ((1000·d) div n_risk) and a prefix-sum window
    * accumulates, so no refold and no doubles at all. Same
    * calendar-sized single-partition windows as the life table
    * (bounded BY SEMANTICS: one row per distinct duration).
    */
  def nelsonAalen(
      df: DataFrame,
      durationCol: String,
      observedCol: String): DataFrame = {
    val perT = df
      .select(col(durationCol).cast("long").as("t"),
        col(observedCol).cast("boolean").as("obs"))
      .groupBy(col("t"))
      .agg(sum(when(col("obs"), 1L).otherwise(0L)).as("d"),
        sum(when(col("obs"), 0L).otherwise(1L)).as("c"))
    val wRisk = Window.orderBy(col("t").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perT.withColumn("n_risk", sum(col("d") + col("c")).over(wRisk))
      .withColumn("h_pm",
        sum(expr("(1000 * d) div n_risk")).over(wCum))
      .select(col("t"), col("n_risk"), col("d"), col("c"), col("h_pm"))
  }
}
