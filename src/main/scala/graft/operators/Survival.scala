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

  /** Greenwood's cumulative variance factor (Greenwood 1926) — the
    * uncertainty leg of the KM curve: Var(Ŝ(t)) = Ŝ(t)² ·
    * Σ_{tᵢ≤t} dᵢ/(nᵢ(nᵢ−dᵢ)). The sum is emitted EXACTLY as the
    * floored ×10⁹ prefix sum gw_x1e9 = Σ (10⁹·dᵢ) div (nᵢ·(nᵢ−dᵢ)) —
    * the [[nelsonAalen]] rendering discipline applied to the variance
    * increments (the ×Ŝ² and the √ for a CI belong to the float
    * presentation layer, not the certified engine output). A terminal
    * step where everyone at risk events (nᵢ = dᵢ) contributes 0 by
    * convention — Ŝ is already 0 there and the classical factor is
    * undefined. Same calendar-sized life-table shape as [[nelsonAalen]].
    * Overflow: 10⁹·d ≤ ~10¹⁶ at 10⁷ subjects; nᵢ·(nᵢ−dᵢ) ≤ 10¹⁴.
    */
  def greenwood(
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
      .withColumn("gw_x1e9",
        sum(expr("""CASE WHEN n_risk - d > 0
                    THEN (1000000000 * d) div (n_risk * (n_risk - d))
                    ELSE 0 END""")).over(wCum))
      .select(col("t"), col("n_risk"), col("d"), col("c"), col("gw_x1e9"))
  }

  /** Restricted mean survival time (RMST — the area under the survival
    * curve up to horizon τ, "expected event-free time in the first τ";
    * the KM summary statistic recommended when hazards are not
    * proportional, Royston & Parmar 2013) — in EXACT integers: the
    * curve is the micro-scaled FLOORED KM fold
    * s_i = (s_{i-1} · (n_i − d_i)) div n_i with s_0 = 10⁶ (a
    * deterministic integer sequence both engines replay bit-for-bit,
    * where the float product needs the sequential-IEEE contract), and
    * the area adds s_{i-1} · (min(t_i, τ) − min(t_{i-1}, τ)) per step.
    * Output: one row per life-table step with the post-step curve value
    * `s_micro`, the running area through that step's time, and
    * `rmst_micro` = the RMST at τ if the table ended here (so the LAST
    * row carries the headline; earlier rows certify the whole fold).
    *
    * Same 100 TB shape as [[kaplanMeier]]: one shuffle to the
    * calendar-sized life table, single-row fold over the sorted array.
    * Overflow: the fold's largest product is 10⁶ · n_risk — exact to
    * ~9·10¹² subjects; area ≤ 10⁶·τ.
    */
  def rmst(
      df: DataFrame,
      durationCol: String,
      observedCol: String,
      horizon: Long): DataFrame = {
    require(horizon > 0, s"horizon must be positive, got $horizon")
    val perT = df
      .select(col(durationCol).cast("long").as("t"),
        col(observedCol).cast("boolean").as("obs"))
      .groupBy(col("t"))
      .agg(sum(when(col("obs"), 1L).otherwise(0L)).as("d"),
        sum(when(col("obs"), 0L).otherwise(1L)).as("c"))
    val w = Window.orderBy(col("t").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risk = perT.withColumn("n_risk", sum(col("d") + col("c")).over(w))
    risk
      .agg(sort_array(collect_list(
        struct(col("t"), col("d"), col("c"), col("n_risk")))).as("a"))
      .select(explode(expr(
        s"""transform(a, (x, i) -> named_struct(
             't', x.t, 'n_risk', x.n_risk, 'd', x.d, 'c', x.c,
             'f', aggregate(slice(a, 1, i + 1),
               named_struct('s', 1000000L, 'area', 0L, 'pt', 0L),
               (acc, y) -> named_struct(
                 's', (acc.s * (y.n_risk - y.d)) div y.n_risk,
                 'area', acc.area
                   + acc.s * (least(y.t, ${horizon}L)
                              - least(acc.pt, ${horizon}L)),
                 'pt', y.t))))"""))
        .as("r"))
      .select(col("r.t").as("t"), col("r.n_risk").as("n_risk"),
        col("r.d").as("d"), col("r.c").as("c"),
        col("r.f.s").as("s_micro"),
        col("r.f.area").as("area_micro"),
        (col("r.f.area") + col("r.f.s")
          * (lit(horizon) - least(col("r.f.pt"), lit(horizon))))
          .as("rmst_micro"))
  }

  /** Two-group log-rank test (Mantel 1966) over per-subject
    * `(durationCol, observedCol, inACol)` rows: does group A's event
    * timing differ from B's, with right-censoring handled? Per-group
    * at-risk sets come from one DESCENDING cumulative sum over the
    * (group × duration) grid — 2·|distinct durations| rows, bounded
    * by the observation calendar, never by subjects. At each
    * observed-event time the hypergeometric E and V terms floor to
    * exact ×1000/×10⁶ renderings (numerators in DECIMAL(38,0), one
    * truncating div per term); χ²×1000 composes from the two sums
    * with one more division. Censored subjects at time t stay at
    * risk AT t (the standard deaths-before-censoring convention).
    * One row out: (n_a, n_b, o_a, o_b, e_a_pm, v_ppm, chi2_x1000).
    */
  def logRank(
      df: DataFrame,
      durationCol: String,
      observedCol: String,
      inACol: String): DataFrame = {
    val perUser = df.select(col(durationCol).cast("long").as("t"),
      col(observedCol).cast("boolean").as("obs"),
      col(inACol).cast("boolean").as("in_a"))
    val cell = perUser.groupBy(col("in_a"), col("t"))
      .agg(count(lit(1)).as("c_all"),
        sum(when(col("obs"), 1L).otherwise(0L)).as("c_obs"))
    val grid = cell.select(col("t")).distinct()
      .withColumn("in_a", explode(array(lit(true), lit(false))))
      .join(cell, Seq("in_a", "t"), "left")
      .na.fill(0L, Seq("c_all", "c_obs"))
    val wDesc = Window.partitionBy(col("in_a")).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = grid.withColumn("n_at", sum(col("c_all")).over(wDesc))
    val terms = risk.filter(col("in_a"))
      .select(col("t"), col("n_at").as("n_a_t"), col("c_obs").as("d_a_t"))
      .join(risk.filter(!col("in_a"))
        .select(col("t"), col("n_at").as("n_b_t"), col("c_obs").as("d_b_t")),
        Seq("t"))
      .withColumn("n_t", col("n_a_t") + col("n_b_t"))
      .withColumn("d_t", col("d_a_t") + col("d_b_t"))
      .filter(col("d_t") > 0)
      .withColumn("e_term", expr("(1000 * d_t * n_a_t) div n_t"))
      .withColumn("v_term", when(col("n_t") > 1, expr(
        """(CAST(1000000 AS DECIMAL(38,0)) * d_t * n_a_t
            * (n_t - n_a_t) * (n_t - d_t))
           div (CAST(n_t AS DECIMAL(38,0)) * n_t * (n_t - 1))"""))
        .otherwise(0L))
    val sizes = perUser.agg(
      sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"))
    // coalesce: zero observed events anywhere leaves `terms` empty —
    // the test then reports all-zero statistics, not nulls
    terms.agg(coalesce(sum(col("d_a_t")), lit(0L)).as("o_a"),
        coalesce(sum(col("d_b_t")), lit(0L)).as("o_b"),
        coalesce(sum(col("e_term")), lit(0L)).as("e_a_pm"),
        coalesce(sum(col("v_term")), lit(0L)).as("v_ppm"))
      .crossJoin(broadcast(sizes))
      .withColumn("chi2_x1000",
        when(col("v_ppm") > 0, expr(
          """(CAST(1000 AS DECIMAL(38,0)) * (1000 * o_a - e_a_pm)
              * (1000 * o_a - e_a_pm)) div v_ppm"""))
          .otherwise(0L))
      .select(col("n_a"), col("n_b"), col("o_a"), col("o_b"),
        col("e_a_pm"), col("v_ppm"), col("chi2_x1000"))
  }
}
