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

  /** [[gapFillDaily]]'s interpolating sibling: complete the per-key
    * daily spine and fill interior gaps by LINEAR interpolation
    * between the surrounding known samples — the resample mode for
    * continuous quantities (a temperature, a balance) where
    * carry-forward would step. Leading/trailing gaps stay null (no
    * extrapolation). Emits `v_interp` (double) beside the original
    * column; known days pass their value through exactly.
    *
    * Determinism: with integer values the interpolation is ONE integer
    * product/difference pair, one IEEE division, one addition — the
    * same op sequence on any engine. Scale shape = gapFillDaily's:
    * per-key spine, one join, two window passes over one partitioning.
    */
  def interpolateDaily(
      df: DataFrame,
      keyCols: Seq[String],
      dateCol: String,
      valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val spine = df.groupBy(keys: _*)
      .agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
      .select(keys :+ explode(sequence(col("__lo"), col("__hi"),
        expr("interval 1 day"))).as(dateCol): _*)
    val joined = spine.join(df, keyCols :+ dateCol, "left")
    val wb = Window.partitionBy(keys: _*).orderBy(col(dateCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys: _*).orderBy(col(dateCol).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    joined
      .withColumn("__pv", last(v, ignoreNulls = true).over(wb))
      .withColumn("__pd", last(when(v.isNotNull, col(dateCol)),
        ignoreNulls = true).over(wb))
      .withColumn("__nv", first(v, ignoreNulls = true).over(wf))
      .withColumn("__nd", first(when(v.isNotNull, col(dateCol)),
        ignoreNulls = true).over(wf))
      .withColumn("v_interp",
        when(v.isNotNull, v.cast("double"))
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv").cast("double") +
              ((col("__nv") - col("__pv")) *
                datediff(col(dateCol), col("__pd"))).cast("double") /
                datediff(col("__nd"), col("__pd")).cast("double")))
      .drop("__pv", "__pd", "__nv", "__nd")
  }

  /** Per-key exponentially weighted moving average (the classic
    * exponential-smoothing forecast: Brown 1956 / Hunter 1986's EWMA
    * chart) with a DYADIC smoothing factor α = 1/2^halvings:
    * s_1 = x_1; s_t = s_{t-1} + (x_t − s_{t-1})·α. Restricting α to
    * powers of two makes every step EXACT in IEEE doubles when the
    * inputs are integers (subtraction of same-scale dyadics, an exact
    * power-of-two division, an exact aligned add), so any engine
    * replays the fold bit-identically — float EWMA with α = 0.3 differs
    * in the last ulps across engines; dyadic EWMA cannot, while still
    * spanning the useful smoothing range (1/2, 1/4, 1/8, …).
    *
    * PRECONDITIONS (documented, not silently degraded): `orderCol` must
    * be unique within a key (it is the sort key of the fold), and
    * |values|·2^(halvings·series_len) must fit 53 mantissa bits for the
    * exactness claim — daily aggregates over bounded windows (the
    * intended shape) sit far inside it.
    *
    * Result: one row per key — `(keyCols*, n_points, ewma)`.
    *
    * Scale shape: ONE shuffle (the groupBy); the fold is a codegen
    * higher-order `aggregate` over the collected per-key series, so
    * state is bounded by series length (a calendar, not the corpus).
    * The inherently sequential recurrence lives inside one combinator —
    * the same altitude as DuckDB's `list_reduce`, which the oracle uses
    * to replay it.
    */
  def ewmaDyadic(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String,
      halvings: Int = 1): DataFrame = {
    require(halvings >= 1 && halvings <= 20,
      s"halvings must be in [1, 20], got $halvings")
    val keys = keyCols.map(col)
    val den = (1L << halvings).toDouble
    df.groupBy(keys: _*)
      .agg(sort_array(collect_list(
        struct(col(orderCol).as("o"), col(valueCol).cast("double").as("v"))))
        .as("__series"))
      .select(keys :+ size(col("__series")).cast("long").as("n_points") :+
        expr(
          s"""aggregate(
                slice(transform(__series, s -> s.v), 2, size(__series) - 1),
                element_at(transform(__series, s -> s.v), 1),
                (acc, x) -> acc + (x - acc) / ${den}D)""").as("ewma"): _*)
  }

  /** Holt's linear-trend double exponential smoothing (Holt 1957,
    * reprinted IJF 2004) in PURE INTEGER arithmetic with α = β = 1/2:
    * per key over the ordered integer series, l_1 = x_1, b_1 = 0, then
    *   l_t = (x_t + l_{t−1} + b_{t−1}) div 2
    *   b_t = (b_{t−1} + (l_t − l_{t−1})) div 2
    * — the level recurrence smooths toward the trend-projected
    * baseline, the trend recurrence smooths the level delta. `div` is
    * TRUNCATED integer division, identical in Spark (`div`) and DuckDB
    * (`//`) including negative operands (probed: −7 div 2 = −3 in
    * both), so any engine replays the fold bit-identically with NO
    * mantissa-budget precondition — the fixed-point sibling of
    * [[ewmaDyadic]]'s exact-dyadic-double contract, trading its
    * fractional tail for unbounded series length. The one-step
    * forecast l + b comes out as a plain integer sum.
    *
    * `orderCol` must be unique within a key (it sorts the fold).
    * Result: one row per key — `(keyCols*, n_points, level, trend,
    * forecast_next)`, all BIGINT.
    *
    * Scale shape: ONE shuffle (the groupBy); the inherently sequential
    * recurrence runs inside one codegen higher-order `aggregate` over
    * the collected per-key series — state bounded by series length (a
    * calendar, not the corpus), the [[ewmaDyadic]] altitude. The
    * oracle replays it as a per-key recursive CTE.
    */
  def holtLinear(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    df.groupBy(keys: _*)
      .agg(sort_array(collect_list(
        struct(col(orderCol).as("o"), col(valueCol).cast("long").as("v"))))
        .as("__series"))
      .withColumn("__fold", expr(
        """aggregate(
             slice(transform(__series, s -> s.v), 2, size(__series) - 1),
             named_struct('l', element_at(transform(__series, s -> s.v), 1),
                          'b', CAST(0 AS BIGINT)),
             (acc, x) -> named_struct(
               'l', (x + acc.l + acc.b) div 2,
               'b', (acc.b + ((x + acc.l + acc.b) div 2 - acc.l)) div 2))"""))
      .select(keys :+ size(col("__series")).cast("long").as("n_points") :+
        col("__fold.l").as("level") :+ col("__fold.b").as("trend") :+
        (col("__fold.l") + col("__fold.b")).as("forecast_next"): _*)
  }

  /** Croston's method (Croston 1972) for INTERMITTENT demand — the
    * forecaster the smooth-series trio ([[ewmaDyadic]], [[holtLinear]],
    * [[holtWinters]]) mishandles: when most periods are zero, smoothing
    * the raw series drags the level toward 0 and forecasts nothing.
    * Croston smooths two series that update ONLY on demand events —
    * the demand SIZE z and the inter-demand INTERVAL p — and forecasts
    * z/p per period. Pure integer arithmetic with α = 1/2 (truncated
    * halving, identical in Spark `div`, DuckDB `//`, JVM `/`):
    *   first demand (q₁ at day d₁): z = q₁, p = 1, prev = d₁
    *   each later demand (q at day d): z ← (q + z) div 2,
    *     p ← ((d − prev) + p) div 2, prev ← d
    * (the p = 1 cold start is the stated deterministic convention —
    * classic seeding uses the first interval, an equally arbitrary
    * constant that needs two events before any forecast exists).
    * The per-period rate emits as ONE floored cross-multiplication
    * rate_x1000 = (1000·z) div p — never an IEEE division.
    *
    * `df` must already be the DEMAND-EVENT frame (zero periods absent —
    * that sparsity is the method's input contract); `orderCol` is an
    * epoch-day (or any integer time) unique within key. Result:
    * `(keyCols*, n_demand, level_q, interval_p, rate_x1000)`.
    *
    * Scale shape: ONE shuffle to demand-event-count per-key series
    * (sparse by definition — at TPC-H shapes, tail-order days per
    * priority: hundreds over seven YEARS), the recurrence folds inside
    * one codegen `aggregate` with a three-long struct state.
    */
  def croston(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    df.groupBy(keys: _*)
      .agg(sort_array(collect_list(
        struct(col(orderCol).cast("long").as("o"),
          col(valueCol).cast("long").as("v"))))
        .as("__series"))
      .withColumn("__fold", expr(
        """aggregate(
             slice(__series, 2, size(__series) - 1),
             named_struct(
               'z', element_at(__series, 1).v,
               'p', CAST(1 AS BIGINT),
               'prev', element_at(__series, 1).o),
             (acc, s) -> named_struct(
               'z', (s.v + acc.z) div 2,
               'p', ((s.o - acc.prev) + acc.p) div 2,
               'prev', s.o))"""))
      .select(keys :+ size(col("__series")).cast("long").as("n_demand") :+
        col("__fold.z").as("level_q") :+ col("__fold.p").as("interval_p") :+
        expr("(1000 * __fold.z) div __fold.p").as("rate_x1000"): _*)
  }

  /** Holt-Winters additive seasonal smoothing (Winters 1960) in PURE
    * INTEGER arithmetic with α = β = γ = 1/2 and period `m`: per key
    * over the ordered integer series, with step ordinal t (1-based)
    * and seasonal slot idx = (t−1) mod m,
    *   l_1 = x_1, b_1 = 0, s = all-zero
    *   l_t = ((x_t − s[idx]) + (l + b)) div 2
    *   b_t = (b + (l_t − l)) div 2
    *   s[idx] ← (s[idx] + (x_t − l_t)) div 2
    * — deseasonalized level, smoothed trend, and a per-slot seasonal
    * correction that converges from the zero start (the deterministic
    * cold-start initialization; classic first-period seeding is a
    * different, equally arbitrary constant). Truncated division is
    * identical in Spark `div`, DuckDB `//`, and JVM `/`, so the fold
    * replays bit-identically — completing the forecasting trio
    * ([[ewmaDyadic]] level-only, [[holtLinear]] +trend, this +season).
    * One-step forecast: l + b + s[t mod m].
    *
    * `orderCol` must be unique within a key. Result per key:
    * `(keyCols*, n_points, level, trend, season_next, forecast_next)`.
    *
    * Scale shape: ONE shuffle to calendar-sized per-key series; the
    * recurrence folds inside one codegen `aggregate` whose state is a
    * struct of two longs + an m-array — bounded by the period, not the
    * corpus. The oracle replays it as a per-key recursive CTE carrying
    * the seasonal list.
    */
  def holtWinters(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String,
      period: Int = 7): DataFrame = {
    require(period >= 2 && period <= 366, s"period out of range: $period")
    val keys = keyCols.map(col)
    df.groupBy(keys: _*)
      .agg(sort_array(collect_list(
        struct(col(orderCol).as("o"), col(valueCol).cast("long").as("v"))))
        .as("__series"))
      .withColumn("__fold", expr(
        s"""aggregate(
             slice(transform(__series, s -> s.v), 2, size(__series) - 1),
             named_struct(
               'l', element_at(transform(__series, s -> s.v), 1),
               'b', CAST(0 AS BIGINT),
               't', CAST(1 AS BIGINT),
               's', array_repeat(CAST(0 AS BIGINT), $period)),
             (acc, x) -> named_struct(
               'l', ((x - element_at(acc.s, CAST(pmod(acc.t, $period) AS INT) + 1))
                      + (acc.l + acc.b)) div 2,
               'b', (acc.b + (((x - element_at(acc.s, CAST(pmod(acc.t, $period) AS INT) + 1))
                      + (acc.l + acc.b)) div 2 - acc.l)) div 2,
               't', acc.t + 1,
               's', transform(acc.s, (sv, i) ->
                 IF(i = CAST(pmod(acc.t, $period) AS INT),
                    (sv + (x - (((x - sv) + (acc.l + acc.b)) div 2))) div 2,
                    sv))))"""))
      .select(keys ++ Seq(
        size(col("__series")).cast("long").as("n_points"),
        col("__fold.l").as("level"),
        col("__fold.b").as("trend"),
        expr(s"element_at(__fold.s, CAST(pmod(__fold.t, $period) AS INT) + 1)")
          .as("season_next"),
        (col("__fold.l") + col("__fold.b") +
          expr(s"element_at(__fold.s, CAST(pmod(__fold.t, $period) AS INT) + 1)"))
          .as("forecast_next")): _*)
  }

  /** One-sided CUSUM change detection (Page 1954, "Continuous
    * inspection schemes"): per key, over the ordered series,
    * c⁺_t = max(0, c⁺_{t-1} + x_t − target − slack), alarming where
    * c⁺_t ≥ threshold — the standard drift detector for data-quality
    * monitoring (a source whose value distribution shifts upward trips
    * the alarm long before a mean-over-everything would move). The
    * baseline `target` is the key's FIRST observation.
    *
    * The recurrence NEVER runs as a sequential fold: by the classic
    * identity c⁺_t = S_t − min(0, min_{j≤t} S_j) with
    * S_t = Σ_{i≤t}(x_i − target − slack), it is a running sum minus a
    * running min — TWO stock window aggregates over one partitioning,
    * exact in integer arithmetic, one shuffle, scale-independent state.
    * `orderCols` must be unique per key.
    *
    * Result: input columns + `c_plus` + `alarm`.
    */
  def cusumUpper(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      slack: Long,
      threshold: Long): DataFrame = {
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val keys = keyCols.map(col)
    val ord = orderCols.map(c => col(c).asc)
    val w = Window.partitionBy(keys: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // three stacked passes over ONE partitioning (baseline → running
    // sum → running min): Catalyst plans a single exchange + sort
    df.withColumn("__t", first(col(valueCol)).over(w))
      .withColumn("__s",
        sum(col(valueCol) - col("__t") - lit(slack)).over(w))
      .withColumn("c_plus",
        col("__s") - least(lit(0L), min(col("__s")).over(w)))
      .withColumn("alarm", col("c_plus") >= threshold)
      .drop("__t", "__s")
  }

  /** Per-key time-weighted average over an irregular series — the
    * metrics-correct mean when samples arrive unevenly (a value held
    * for an hour must weigh 60× one held a minute; the plain AVG every
    * naive dashboard computes is wrong the moment sampling is bursty).
    * Left-constant (zero-order-hold) semantics: each sample's value
    * holds until the next sample; the final sample spans zero time and
    * contributes only when it is the key's ONLY sample (degenerate
    * span → plain value, documented below).
    *
    * Exactness: the integral `Σ v·Δt` runs in DECIMAL(38,0) over
    * integer values × integer time deltas (loud NULL past 1e38, never
    * a wrap); the single final division is one IEEE double op — both
    * deterministic on any engine. Result: `(keyCols*, area, span_t,
    * twa)` where `twa = area/span` (double) or the plain value for a
    * single-sample key.
    *
    * Scale shape: one window pass (lead) + one aggregate over the same
    * partitioning — Catalyst plans a single exchange.
    */
  def timeWeightedAvg(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      tieCols: Seq[String] = Seq.empty): DataFrame = {
    val keys = keyCols.map(col)
    // tieCols pin the hold order under equal timestamps (their Δt
    // segments are zero-width, so they cannot change area — only make
    // the lead() deterministic)
    val w = Window.partitionBy(keys: _*)
      .orderBy((tsCol +: tieCols).map(c => col(c).asc): _*)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    df.withColumn("__next", lead(col(tsCol), 1).over(w))
      .withColumn("__dt", col("__next") - col(tsCol))
      .groupBy(keys: _*)
      .agg(
        sum((col(valueCol) * col("__dt")).cast(dec)).as("__area"),
        sum(col("__dt").cast(dec)).as("__span"),
        min(col(valueCol)).as("__only"), // the single-sample fallback
        count(lit(1)).as("__n"))
      .select(keys :+
        coalesce(col("__area"), lit(0).cast(dec)).cast("long").as("area") :+
        coalesce(col("__span"), lit(0).cast(dec)).cast("long").as("span_t") :+
        when(col("__n") === 1 || col("__span") === 0,
          col("__only").cast("double"))
          .otherwise(col("__area").cast("double") / col("__span").cast("double"))
          .as("twa"): _*)
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

  /** Mann–Kendall trend test (Mann 1945; Kendall 1975), the
    * distribution-free "is this metric drifting" screen run per series
    * before alerting on it: S = Σ_{i<j} sign(v_j − v_i) over the keyed
    * day series — all-integer, no slope fit, robust to outliers. Emits
    * per key: `n_obs`, `n_pairs`, `s_stat`, the normalized
    * `s_pm` = S·1000 div n_pairs (Kendall's τ_a per-mille, floor
    * division), and the sign-only `trend` label. EVERY observed key is
    * emitted, including single-observation keys with zero pairs
    * (n_pairs = 0, s_stat = 0, s_pm = 0, trend = 'flat') — so callers
    * that re-aggregate strata (seasonal MK) see n_obs count ALL
    * observed rows, exactly what an all-days oracle certifies.
    *
    * Scale shape: the pair join is WITHIN key over an already-aggregated
    * per-day series — |days|² per key, bounded by the calendar (a
    * 10-year daily series is 6.6 M pairs), never by raw event count.
    * The upstream daily rollup is where the 100 TB lives and that is
    * one partial-agg shuffle; this test only ever sees the rollup.
    */
  def mannKendall(
      daily: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    // Three consumers (both pair legs + n_obs) of one bounded frame:
    // pin it once (the q_rfm localCheckpoint pattern) so the upstream
    // daily rollup — and the corpus scan under it — runs ONCE, not 3×.
    val pinned = daily
      .select(keys :+ col(ordCol).as("__o") :+ col(valCol).as("__v"): _*)
      .localCheckpoint(true)
    val a = pinned.select(keys :+ col("__o").as("__o_a") :+ col("__v").as("__v_a"): _*)
    val b = pinned.select(keys :+ col("__o").as("__o_b") :+ col("__v").as("__v_b"): _*)
    val nObs = pinned.groupBy(keys: _*).agg(count(lit(1)).as("n_obs"))
    val pairAgg = a.join(b, keyCols)
      .filter(col("__o_a") < col("__o_b"))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__v_b") > col("__v_a"), 1L)
          .when(col("__v_b") < col("__v_a"), -1L).otherwise(0L)).as("s_stat"))
    // LEFT join FROM nObs: a key whose series has a single observation
    // produces no pairs and would vanish under an inner join — its
    // n_obs must still count (the r13 seasonal-MK divergence).
    nObs.join(pairAgg, keyCols, "left")
      .withColumn("n_pairs", coalesce(col("n_pairs"), lit(0L)))
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
      .withColumn("s_pm",
        when(col("n_pairs") === 0, 0L)
          .otherwise(expr("(s_stat * 1000) div n_pairs")))
      .withColumn("trend",
        when(col("s_stat") > 0, "up")
          .when(col("s_stat") < 0, "down").otherwise("flat"))
      .select(keys :+ col("n_obs") :+ col("n_pairs") :+ col("s_stat") :+
        col("s_pm") :+ col("trend"): _*)
  }

  /** Theil–Sen slope estimator (Theil 1950; Sen 1968): the MEDIAN of all
    * pairwise slopes (v_j − v_i)/(t_j − t_i) over a keyed daily series —
    * the robust trend-rate companion to [[mannKendall]]'s direction test
    * (up to ~29% contamination before it budges). Slopes are kept exact
    * as floor-divided `scale`-scaled integers (units per day × scale);
    * the median is the LOWER median (element at rank ⌈n/2⌉ of the sorted
    * multiset) so both engines agree without interpolation.
    *
    * Same bounded-pair scale shape as [[mannKendall]]; the median rank
    * is a per-key window over the pair table, bounded by |days|²/key.
    */
  def theilSenSlope(
      daily: DataFrame,
      keyCols: Seq[String],
      dateCol: String,
      valCol: String,
      scale: Long = 1000L): DataFrame = {
    val keys = keyCols.map(col)
    // Pin the bounded daily frame once — both pair legs read the same
    // materialization instead of re-running the upstream rollup twice.
    val pinned = daily
      .select(keys :+ col(dateCol).as("__d") :+ col(valCol).as("__v"): _*)
      .localCheckpoint(true)
    val a = pinned.select(keys :+ col("__d").as("__d_a") :+ col("__v").as("__v_a"): _*)
    val b = pinned.select(keys :+ col("__d").as("__d_b") :+ col("__v").as("__v_b"): _*)
    val slopes = a.join(b, keyCols)
      .filter(col("__d_a") < col("__d_b"))
      .select(keys :+
        expr(s"((__v_b - __v_a) * $scale) div datediff(__d_b, __d_a)")
          .as("slope_scaled"): _*)
    val w = Window.partitionBy(keys: _*).orderBy(col("slope_scaled").asc)
    val wc = Window.partitionBy(keys: _*)
    slopes
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(wc))
      .filter(expr("__rn = (n_pairs + 1) div 2"))
      .select(keys :+ col("n_pairs") :+ col("slope_scaled"): _*)
  }

  /** c-chart (Shewhart attribute control chart for counts): flag the
    * days whose count exceeds the series mean by more than `sigma`
    * Poisson standard deviations — mean + σ·√mean, decided EXACTLY by
    * cross-multiplication ((v·nd − tot)² > σ²·tot·nd with v·nd > tot)
    * so no square root or float mean is ever materialized. The squared
    * leg runs in DECIMAL(38,0): v·nd at planetary daily volumes
    * (10^10 events × 10⁴ days) squares past BIGINT.
    *
    * Emits EVERY day with its `alarm` verdict (an ops dashboard wants
    * the whole chart, not just the violations). Two shuffles total:
    * the per-key stats rollup and the stats join back — both on the
    * already-bounded daily table.
    */
  def cChart(
      daily: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valCol: String,
      sigma: Int = 2): DataFrame = {
    val keys = keyCols.map(col)
    // Pin once: the stats rollup and the verdict join both read the
    // same bounded materialization (one upstream corpus scan, not two).
    val pinned = daily.localCheckpoint(true)
    val stats = pinned.groupBy(keys: _*)
      .agg(sum(col(valCol)).as("tot"), count(lit(1)).as("nd"))
    val s2 = sigma.toLong * sigma
    pinned.join(stats, keyCols)
      .withColumn("alarm",
        col(valCol) * col("nd") > col("tot") &&
          expr(s"""CAST($valCol * nd - tot AS DECIMAL(38,0)) *
                   CAST($valCol * nd - tot AS DECIMAL(38,0)) >
                   CAST($s2 AS DECIMAL(38,0)) * CAST(tot AS DECIMAL(38,0)) *
                   CAST(nd AS DECIMAL(38,0))"""))
      .select(keys :+ col(ordCol) :+ col(valCol) :+ col("tot") :+
        col("nd") :+ col("alarm"): _*)
  }

  /** Record statistics (Foster & Stuart 1954; the nonparametric trend
    * probe climatology uses): per key, how many days set a new running
    * HIGH and how many a new running LOW — under exchangeability both
    * counts concentrate near Σ 1/i ≈ ln n, so an excess of highs over
    * lows is trend evidence with zero distributional assumptions. The
    * first observation is a record on both sides by convention. One
    * exclusive-frame window per key (bounded daily series), one rollup.
    */
  def recordDays(
      daily: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(ordCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    daily
      .withColumn("__pmax", max(col(valCol)).over(w))
      .withColumn("__pmin", min(col(valCol)).over(w))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("__pmax").isNull || col(valCol) > col("__pmax"), 1L)
          .otherwise(0L)).as("n_record_highs"),
        sum(when(col("__pmin").isNull || col(valCol) < col("__pmin"), 1L)
          .otherwise(0L)).as("n_record_lows"))
  }

  /** Pettitt change-point test (Pettitt 1979): the rank-based "WHERE
    * did this series shift" companion to [[mannKendall]]'s "is it
    * drifting". U_t = Σ_{i≤t} Σ_{j>t} sign(v_i − v_j); the change
    * point is the t maximizing |U_t| and K = max|U_t| the test
    * statistic — all-integer via the standard recursion
    * U_t = Σ_{s≤t} r_s with r_s = Σ_{j≠s} sign(v_s − v_j): one
    * within-key pair aggregate producing the per-day r_s spine, one
    * bounded cumulative window, one argmax. Emits per key `n_obs`,
    * `k_stat` = max|U|, `cp_day` (earliest day attaining it — the last
    * day BEFORE the shift), `u_at_cp` (signed: positive = level drop
    * after cp, negative = rise). Single-observation keys emit
    * k_stat = 0 (the MK zero-pair discipline).
    *
    * Scale shape: identical to [[mannKendall]] — pairs are |days|²/key
    * over the pinned calendar-bounded rollup, the cumsum window is
    * per-key over the day spine.
    */
  def pettitt(
      daily: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val pinned = daily
      .select(keys :+ col(ordCol).as("__o") :+ col(valCol).as("__v"): _*)
      .localCheckpoint(true)
    val a = pinned.select(keys :+ col("__o").as("__o_t") :+ col("__v").as("__v_t"): _*)
    val b = pinned.select(keys :+ col("__o").as("__o_j") :+ col("__v").as("__v_j"): _*)
    val rT = a.join(b, keyCols)
      .filter(col("__o_t") =!= col("__o_j"))
      .groupBy(keys :+ col("__o_t"): _*)
      .agg(sum(when(col("__v_t") > col("__v_j"), 1L)
        .when(col("__v_t") < col("__v_j"), -1L).otherwise(0L)).as("__r"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col("__o_t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pinned.select(keys :+ col("__o").as("__o_t"): _*)
      .join(rT, keyCols :+ "__o_t", "left")
      .withColumn("__r", coalesce(col("__r"), lit(0L)))
      .withColumn("__u", sum(col("__r")).over(wCum))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_obs"),
        min(struct((-abs(col("__u"))).as("na"), col("__o_t").as("d"),
          col("__u").as("u"))).as("__best"))
      .select(keys :+ col("n_obs") :+ (-col("__best.na")).as("k_stat") :+
        col("__best.d").as("cp_day") :+ col("__best.u").as("u_at_cp"): _*)
  }

  /** Spearman rank correlation AGAINST TIME (the rank-based trend
    * strength next to [[mannKendall]]'s sign test): x-ranks are the day
    * order (distinct per key, so exactly 2·row_number doubled), y-ranks
    * the value's doubled midranks (min+max of the tie run — the
    * Wilcoxon rendering, no .5 ever materializes), and
    * ρ·1000 = 1000 − (1500·Σd₂²) div (n(n²−1)) with d₂ the DOUBLED rank
    * difference (Σd² = Σd₂²/4 folded into the constant). Floor division
    * — the exactness is in Σd₂², which is emitted raw. Average-rank
    * ties enter the classic Σd² formula directly (the standard
    * rendering when ties are few; the oracle replays it identically).
    * n < 2 emits ρ = 0.
    */
  def spearmanTrend(
      daily: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val wX = Window.partitionBy(keys: _*).orderBy(col(ordCol).asc)
    val wV = Window.partitionBy(keys: _*).orderBy(col(valCol).asc)
    val wTie = Window.partitionBy(keys :+ col(valCol): _*)
    daily
      .withColumn("__rx2", lit(2L) * row_number().over(wX))
      .withColumn("__rnv", row_number().over(wV).cast("long"))
      .withColumn("__ry2", min(col("__rnv")).over(wTie) + max(col("__rnv")).over(wTie))
      .withColumn("__d2", col("__rx2") - col("__ry2"))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_obs"),
        sum(col("__d2") * col("__d2")).as("sum_d2_sq"))
      .withColumn("rho_pm",
        when(col("n_obs") < 2, 0L).otherwise(
          lit(1000L) - expr("(1500 * sum_d2_sq) div (n_obs * (n_obs * n_obs - 1))")))
  }

  /** Hodges–Lehmann location estimator (1963) — the point estimate
    * behind the Wilcoxon test: the MEDIAN of all pairwise Walsh
    * averages (vᵢ+vⱼ)/2 over i ≤ j. Robust to ~29% contamination like
    * [[theilSenSlope]] (its location-scale sibling), and kept exact by
    * emitting the DOUBLED value `hl_x2` = lower median of (vᵢ+vⱼ) —
    * the sum IS the doubled average, so no .5 materializes. Same
    * |days|²/key calendar-bounded pair shape as the rest of the
    * battery; i = j pairs included (the standard definition).
    *
    * The median over the |days|²/key Walsh sums is the VALUE-SPINE
    * lower median (the `Stats.madPerKey` shape), not a row_number
    * window: the pair table collapses map-side to one (key, sum,
    * multiplicity) row per DISTINCT sum — integer daily values make
    * distinct sums range-bounded (≤ 2·|value range|), orders of
    * magnitude below pair count — and the only per-key sort is the
    * cumulative window over that spine. The window shape it replaces
    * sorted ~13M raw pair rows in ONE task for a decade-long
    * single-key series.
    */
  def hodgesLehmann(
      daily: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val pinned = daily
      .select(keys :+ col(ordCol).as("__o") :+ col(valCol).as("__v"): _*)
      .localCheckpoint(true)
    val a = pinned.select(keys :+ col("__o").as("__o_a") :+ col("__v").as("__v_a"): _*)
    val b = pinned.select(keys :+ col("__o").as("__o_b") :+ col("__v").as("__v_b"): _*)
    val spine = a.join(b, keyCols)
      .filter(col("__o_a") <= col("__o_b"))
      .groupBy(keys :+ (col("__v_a") + col("__v_b")).as("__s"): _*)
      .agg(count(lit(1)).as("__m"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    spine
      .withColumn("__cm", sum(col("__m")).over(wCum))
      .withColumn("__np", sum(col("__m")).over(wAll))
      .filter(col("__cm") >= expr("(__np + 1) div 2"))
      .groupBy(keys: _*)
      .agg(max(col("__np")).as("n_pairs"), min(col("__s")).as("hl_x2"))
      .select(keys :+ col("n_pairs") :+ col("hl_x2"): _*)
  }

  /** Bartels rank von-Neumann ratio (1982), the rank-based serial-
    * correlation randomness test: RVN = Σ(Rᵢ−Rᵢ₊₁)² / Σ(Rᵢ−R̄)² ≈ 2
    * under randomness, < 2 under positive autocorrelation/trend,
    * > 2 under alternation. TIE-EXACT in integers: with doubled
    * midranks ΣR₂ᵢ = n(n+1) ALWAYS, so the mean doubled rank is
    * exactly n+1 and both sums are integral —
    * `rvn_x1000` = (1000·Σ(R₂ᵢ−R₂ᵢ₊₁)²) div (Σ(R₂ᵢ−(n+1))²) with the
    * factor 4 cancelling. A constant series (denominator 0) emits 0.
    * Completes the randomness battery next to [[turningPoints]]
    * (extrema count) and the runs test (sign runs) — this one sees
    * rank-level serial structure both of those miss.
    */
  def bartelsRvn(
      daily: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col(ordCol).asc)
    val wV = Window.partitionBy(keys: _*).orderBy(col(valCol).asc)
    val wTie = Window.partitionBy(keys :+ col(valCol): _*)
    val wN = Window.partitionBy(keys: _*)
    daily
      .withColumn("__rnv", row_number().over(wV).cast("long"))
      .withColumn("__r2", min(col("__rnv")).over(wTie) + max(col("__rnv")).over(wTie))
      .withColumn("__nxt", lead(col("__r2"), 1).over(wOrd))
      .withColumn("__n", count(lit(1)).over(wN))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_obs"),
        sum(when(col("__nxt").isNotNull,
          (col("__r2") - col("__nxt")) * (col("__r2") - col("__nxt")))
          .otherwise(0L)).as("nm_num"),
        sum((col("__r2") - (col("__n") + 1)) * (col("__r2") - (col("__n") + 1)))
          .as("nm_den"))
      .withColumn("rvn_x1000",
        when(col("nm_den") === 0, 0L)
          .otherwise(expr("(1000 * nm_num) div nm_den")))
  }

  /** Turning-point census (Kendall's randomness test): per key, the
    * number of interior observations that are strict local maxima or
    * minima. Under randomness E[T] = 2(n−2)/3, so the emitted
    * `tp_excess_x3` = 3·T − 2·n_interior reads as a signed exact
    * deviation — negative means smoother-than-random (trend/cycles),
    * positive means oscillation. One lag+lead window per key.
    */
  def turningPoints(
      daily: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(ordCol).asc)
    daily
      .withColumn("__prev", lag(col(valCol), 1).over(w))
      .withColumn("__next", lead(col(valCol), 1).over(w))
      .filter(col("__prev").isNotNull && col("__next").isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_interior"),
        sum(when(
          (col(valCol) > col("__prev") && col(valCol) > col("__next")) ||
            (col(valCol) < col("__prev") && col(valCol) < col("__next")),
          1L).otherwise(0L)).as("n_turning"))
      .withColumn("tp_excess_x3",
        col("n_turning") * 3 - col("n_interior") * 2)
  }

  /** Allen's interval-algebra relation (Allen 1983) between intervals
    * [a1, a2] and [b1, b2] as a label column — the vocabulary for
    * session-vs-session / incident-vs-deploy temporal audits. The CASE
    * ladder is ordered so the 13 relations stay mutually exclusive and
    * total (degenerate point intervals classify via the equality arms).
    */
  def allenRelation(a1: Column, a2: Column, b1: Column, b2: Column): Column =
    when(a1 === b1 && a2 === b2, "equals")
      .when(a2 < b1, "before")
      .when(b2 < a1, "after")
      .when(a2 === b1, "meets")
      .when(b2 === a1, "met_by")
      .when(a1 === b1, when(a2 < b2, "starts").otherwise("started_by"))
      .when(a2 === b2, when(a1 > b1, "finishes").otherwise("finished_by"))
      .when(a1 > b1 && a2 < b2, "during")
      .when(a1 < b1 && a2 > b2, "contains")
      .when(a1 < b1, "overlaps")
      .otherwise("overlapped_by")

  /** SAX symbolization (Lin, Keogh et al. 2003) — the "time series →
    * token string" bridge of the LLM-pipeline toolbox: piecewise
    * aggregate approximation over fixed-length segments, each segment
    * mean bucketed against the SERIES' OWN quartile breakpoints into
    * the 4-letter alphabet a<b<c<d, emitted as one string per key —
    * ready for n-gram novelty / dedup / motif ops downstream exactly
    * like text. All decisions are exact: breakpoints are type-1
    * quartiles of the deterministic (value, ord) total order, and the
    * segment bucket compares Σv ≤ q·m by cross-multiplication — the
    * irrational Gaussian breakpoints of the original are deliberately
    * replaced by empirical quartiles (stated; equiprobable under the
    * empirical rather than a fitted normal). One rank window + one
    * segment aggregate + one ordered string fold.
    */
  def sax(
      daily: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valCol: String,
      segLen: Int = 7): DataFrame = {
    require(segLen >= 1, s"segLen must be >= 1: $segLen")
    val keys = keyCols.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col(ordCol).asc)
    val wVal = Window.partitionBy(keys: _*)
      .orderBy(col(valCol).asc, col(ordCol).asc)
    val wKey = Window.partitionBy(keys: _*)
    val spine = daily
      .withColumn("__seg", ((row_number().over(wOrd) - 1) / segLen).cast("long"))
      .withColumn("__vrn", row_number().over(wVal).cast("long"))
      .withColumn("__n", count(lit(1)).over(wKey))
    val quarts = spine.groupBy(keys: _*)
      .agg(max(col("__n")).as("n_points"),
        max(when(col("__vrn") === expr("(__n * 1 + 3) div 4"), col(valCol))).as("q1"),
        max(when(col("__vrn") === expr("(__n * 2 + 3) div 4"), col(valCol))).as("q2"),
        max(when(col("__vrn") === expr("(__n * 3 + 3) div 4"), col(valCol))).as("q3"))
    val segs = spine.groupBy(keys :+ col("__seg"): _*)
      .agg(sum(col(valCol)).as("__s"), count(lit(1)).as("__m"))
    segs.join(quarts, keyCols)
      .withColumn("__sym",
        when(col("__s") <= col("q1") * col("__m"), "a")
          .when(col("__s") <= col("q2") * col("__m"), "b")
          .when(col("__s") <= col("q3") * col("__m"), "c")
          .otherwise("d"))
      .groupBy(keys ++ Seq(col("n_points"), col("q1"), col("q2"), col("q3")): _*)
      .agg(count(lit(1)).as("n_segments"),
        array_join(transform(
          array_sort(collect_list(struct(col("__seg"), col("__sym")))),
          x => x.getField("__sym")), "").as("sax"))
  }

  /** Ljung–Box portmanteau Q (1978) over lags 1..maxLag — the ONE
    * whiteness number the per-lag ACF table (q_acf's spine) only
    * implies: Q = n(n+2)·Σ_k ρ̂_k²/(n−k), large ⇒ the series is not
    * white noise at any of the first maxLag lags. Rides the exact
    * n-scaled centered products (cd_t = n·x_t − S, so ρ̂_k =
    * num_k/den with num_k = Σcd_t·cd_{t−k}, den = Σcd_t² — all
    * integers in DECIMAL(38,0)); `lb_q` is then the FIXED double
    * tree n(n+2)·((t₁+t₂)+…+t_m), each t_k ONE IEEE division of the
    * two exact integers num_k² and den²·(n−k) — an oracle replaying
    * the same tree reproduces it bitwise (the [[Stats.regression]]
    * law). num_k² ≤ den² < 10³⁸ keeps exactness to den < 10¹⁹
    * (≈10⁶ daily observations at cent scale per key); overflow nulls
    * the decimal and the guard RAISES instead of emitting a silently
    * half-summed Q. Degenerate keys (n ≤ maxLag or den = 0) emit
    * NULL in both engines. One ordered window + one aggregate.
    */
  /** Pairwise dynamic time warping (Sakoe & Chiba 1978; the Berndt &
    * Clifford 1994 data-mining form) between every pair of keys' series,
    * with EXACT integer |Δ| step costs — the alignment-tolerant series
    * distance the lockstep L1 (also emitted, for contrast) cannot give
    * when one series leads the other. Full O(n·m) DP per pair.
    *
    * Scale contract: series must be CALENDAR-BOUNDED (daily/weekly
    * aggregates — the q_sax/q_matrix_profile spine), because each pair's
    * series collect into ONE row and the DP is a nested sequential
    * fold (`aggregate` over rows × `aggregate` over columns building
    * each DP row) — the documented bounded-single-row-fold exception
    * ([[Survival.kaplanMeier]] class). |keys|² pairs × n·m integer ops:
    * at 5 types × 30 days that is 4.5k ops; for LONG series use a
    * Sakoe-Chiba band upstream (truncate the spine), never this
    * operator raw. Unreachable DP cells carry the 10¹⁵ sentinel, far
    * above any real |Δ| path sum yet safely below Long overflow when
    * added to step costs.
    */
  def dtwPairs(
      daily: DataFrame,
      keyCol: String,
      ordCol: String,
      valCol: String): DataFrame = {
    val series = daily
      .groupBy(col(keyCol).as("k"))
      .agg(sort_array(collect_list(struct(col(ordCol).as("o"),
        col(valCol).cast("long").as("x")))).as("sv"))
      .select(col("k"), expr("transform(sv, e -> e.x)").as("xs"))
      .localCheckpoint(true) // both sides of the bounded pair join
    val b = series.select(col("k").as("k_b"), col("xs").as("ys"))
    series.join(broadcast(b), col("k") < col("k_b"))
      .select(col("k").as("type_a"), col("k_b").as("type_b"),
        size(col("xs")).cast("long").as("n_a"),
        size(col("ys")).cast("long").as("n_b"),
        expr(
          """element_at(
               aggregate(xs,
                 -- row 0: dp[0][0] = 0, dp[0][j>0] = sentinel
                 concat(array(0L), transform(ys, y -> 1000000000000000L)),
                 (prev, x) -> aggregate(
                   sequence(1, size(ys)),
                   array(1000000000000000L),
                   (row, j) -> concat(row, array(
                     abs(x - element_at(ys, j))
                       + least(element_at(prev, j + 1),
                               element_at(prev, j),
                               element_at(row, -1)))))),
               -1)""").as("dtw_l1"),
        expr("aggregate(zip_with(xs, ys, (a, b) -> abs(a - b)), 0L, " +
          "(acc, v) -> acc + coalesce(v, 0L))").as("lockstep_l1"))
      .orderBy("type_a", "type_b")
  }

  def ljungBox(
      daily: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valCol: String,
      maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 12, s"maxLag out of range: $maxLag")
    val keys = keyCols.map(col)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wKey = Window.partitionBy(keys: _*)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col(ordCol).asc)
    val spine = (1 to maxLag).foldLeft(
      daily
        .withColumn("__n", count(lit(1)).over(wKey))
        .withColumn("__s", sum(col(valCol)).over(wKey))
        .withColumn("__cd", col("__n").cast(dec) * col(valCol) - col("__s"))) {
      case (t, k) =>
        t.withColumn(s"__l$k", lag(col("__cd"), k).over(wOrd))
          .withColumn(s"__p$k", col("__cd") * col(s"__l$k"))
    }.withColumn("__sq", col("__cd") * col("__cd"))
      // per-row DECIMAL overflow nulls silently and sum() would SKIP the
      // row (the cramerVonMises lesson): census the null-producing rows
      // so the aggregate can raise instead of emitting a half-summed Q
      .withColumn("__bad",
        when(col("__cd").isNull || col("__sq").isNull ||
          (1 to maxLag).map(k =>
            col(s"__l$k").isNotNull && col(s"__p$k").isNull).reduce(_ || _),
          1L).otherwise(0L))
    val aggs = Seq(
      max(col("__n")).as("n_points"),
      sum(col("__bad")).as("__nbad"),
      sum(col("__sq")).as("__den")) ++
      (1 to maxLag).map(k => sum(col(s"__p$k")).as(s"__num$k"))
    val g = spine.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      .withColumn("__den",
        when(col("__nbad") > 0,
          raise_error(lit("ljungBox: per-row product overflows " +
            "DECIMAL(38,0) — rescale the input series")).cast(dec))
          .otherwise(col("__den")))
    def loud(c: Column, what: String): Column =
      when(c.isNull,
        raise_error(lit(s"ljungBox: $what overflows DECIMAL(38,0) — " +
          "rescale the input series")).cast(dec)).otherwise(c)
    def loudLong(c: Column, what: String): Column =
      when(c.isNull || abs(c) > lit(Long.MaxValue).cast(dec),
        raise_error(lit(s"ljungBox: $what exceeds BIGINT — rescale the " +
          "input series")).cast("long")).otherwise(c.cast("long"))
    // a short series (n ≤ k) has an EMPTY lag-k sum: null by absence,
    // not overflow — render 0 so the witnesses stay loud-guardable
    def num(k: Int): Column =
      when(col("n_points") <= k, lit(0).cast(dec))
        .otherwise(loud(col(s"__num$k"), s"num$k"))
    val den2 = loud(col("__den") * col("__den"), "den^2")
    val terms = (1 to maxLag).map { k =>
      loud(num(k) * num(k), s"num$k^2").cast("double") /
        (den2 * (col("n_points") - k)).cast("double")
    }
    val nn2 = (col("n_points").cast(dec) * (col("n_points") + 2)).cast("double")
    g.withColumn("lb_q",
        when(col("n_points") <= maxLag || col("__den") === 0,
          lit(null).cast("double"))
          .otherwise(nn2 * terms.reduce(_ + _)))
      .select(keys ++ Seq(col("n_points"),
        loudLong(col("__den"), "den").as("den")) ++
        (1 to maxLag).map(k => loudLong(num(k), s"num$k").as(s"num$k")) :+
        col("lb_q"): _*)
  }
}
