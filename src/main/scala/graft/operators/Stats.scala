package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group simple linear regression and correlation (the regr_slope /
  * regr_intercept / corr family) computed with EXACT moment sums: x and y
  * route through DECIMAL so Sx, Sy, Sxx, Syy, Sxy are exact integers/
  * decimals (associative — partitioning-invariant), and only the final
  * closed-form combination runs in double. Every double step is a single
  * IEEE-rounded op in a fixed expression tree (sqrt is exactly rounded by
  * the standard), so an oracle that mirrors the formula reproduces the
  * output bit-for-bit — unlike the built-in `corr`/`regr_*`, whose
  * running-moment accumulation is shuffle-order-dependent at the ulp.
  *
  * `xCol` is expected small-integer-valued (a day index, a bucket — cast
  * to DECIMAL(12,0)); `yCol` routes through DECIMAL(18,2). One
  * partial+final hash aggregate; no window, no second pass.
  */
object Stats {

  def regression(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast(DecimalType(12, 0))
    val y = col(yCol).cast(DecimalType(18, 2))
    val agg = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast("double").as("__n"),
        sum(x).cast("double").as("__sx"),
        sum(y).cast("double").as("__sy"),
        sum(x * x).cast("double").as("__sxx"),
        sum(y * y).cast("double").as("__syy"),
        sum(x * y).cast("double").as("__sxy"))
    // fixed expression tree — mirror EXACTLY in any oracle. Degenerate
    // groups (n = 1, constant x, constant y) yield NULL via nullif in
    // BOTH engines — without it Spark's non-ANSI 0/0 is NULL while
    // DuckDB's IEEE mode says NaN/inf, and the bitwise contract breaks.
    val covN = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val varXN = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val varYN = col("__n") * col("__syy") - col("__sy") * col("__sy")
    val slope = covN / nullif(varXN, lit(0.0))
    agg.select(
      groupCols.map(col) ++ Seq(
        col("__n").cast("long").as("n"),
        slope.as("slope"),
        ((col("__sy") - slope * col("__sx")) / col("__n")).as("intercept"),
        (covN / sqrt(nullif(varXN * varYN, lit(0.0)))).as("corr")): _*)
  }

  /** First-order partial correlation r_xy·z per group — how much of the
    * x↔y association survives controlling for z: (r_xy − r_xz·r_yz) /
    * √((1−r_xz²)(1−r_yz²)). The [[regression]] determinism discipline:
    * all ten moment sums accumulate EXACTLY in DECIMAL (associative —
    * partitioning-invariant), and only the final closed-form
    * combination runs in double as a FIXED expression tree (each √ and
    * ratio a single IEEE-rounded op), so an oracle mirroring the tree
    * reproduces every double bitwise. Degenerate groups (constant x, y
    * or z; |r| = 1 controls) yield NULL via nullif in BOTH engines.
    * ONE partial+final hash aggregate; no window, no second pass.
    *
    * Per-row input contract (LOUD): |x|, |y|, |z| < 10¹⁹ — a cross
    * product at 10¹⁹ reaches the DECIMAL(38,0) ceiling, where non-ANSI
    * Spark NULLs it and `sum` would silently skip the row (the exact
    * failure [[loudLong]] exists to prevent, but loudLong only sees
    * the accumulator). Each input column raises past the bound.
    */
  def partialCorrelation(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String,
      zCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    // 10¹⁹: the largest magnitude whose cross product stays inside
    // DECIMAL(38,0) — past it the per-row product nulls and sum()
    // silently sheds the row, so the cast itself is made loud
    val bound = lit(new java.math.BigDecimal("10000000000000000000")).cast(dec)
    def loudIn(c: String): Column = {
      val v = col(c).cast(dec)
      when(abs(v) >= bound,
        raise_error(lit(s"partialCorrelation: |$c| >= 1e19 — per-row " +
          "DECIMAL(38,0) moment product would overflow silently")).cast(dec))
        .otherwise(v)
    }
    val x = loudIn(xCol)
    val y = loudIn(yCol)
    val z = loudIn(zCol)
    val agg = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull && col(zCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(x).cast("double").as("__sx"), sum(y).cast("double").as("__sy"),
        sum(z).cast("double").as("__sz"),
        sum(x * x).cast("double").as("__sxx"),
        sum(y * y).cast("double").as("__syy"),
        sum(z * z).cast("double").as("__szz"),
        sum(x * y).cast("double").as("__sxy"),
        sum(x * z).cast("double").as("__sxz"),
        sum(y * z).cast("double").as("__syz"))
    def r(cov: Column, vx: Column, vy: Column): Column =
      cov / sqrt(nullif(vx * vy, lit(0.0)))
    val rxy = r(col("__n") * col("__sxy") - col("__sx") * col("__sy"),
      col("__n") * col("__sxx") - col("__sx") * col("__sx"),
      col("__n") * col("__syy") - col("__sy") * col("__sy"))
    val rxz = r(col("__n") * col("__sxz") - col("__sx") * col("__sz"),
      col("__n") * col("__sxx") - col("__sx") * col("__sx"),
      col("__n") * col("__szz") - col("__sz") * col("__sz"))
    val ryz = r(col("__n") * col("__syz") - col("__sy") * col("__sz"),
      col("__n") * col("__syy") - col("__sy") * col("__sy"),
      col("__n") * col("__szz") - col("__sz") * col("__sz"))
    agg.select(groupCols.map(col) ++ Seq(
      col("__n").cast("long").as("n"),
      rxy.as("r_xy"), rxz.as("r_xz"), ryz.as("r_yz"),
      ((rxy - rxz * ryz) /
        sqrt(nullif((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz), lit(0.0))))
        .as("partial_xy_z")): _*)
  }

  /** Five-number summary per group — min, q1, median, q3, max — with the
    * quartiles as EXPLICIT type-7 order statistics (the numpy/R default):
    * position (n−1)·p is split into an exact floor rank and an exact
    * fractional part ((n−1)·p is exact in double for p ∈ {.25,.5,.75}),
    * and the interpolation v_lo + (v_hi − v_lo)·frac is three
    * single-rounded ops in a fixed tree — an oracle mirroring the formula
    * reproduces every double bitwise (the [[Outliers]] determinism
    * discipline extended to arbitrary quartiles). One window shuffle on
    * the group keys + one final aggregate.
    */
  def summary(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String): DataFrame = {
    val keys = groupCols.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col(valueCol).asc, col(idCol).asc)
    val wAll = Window.partitionBy(keys: _*)
    def quantile(tagged: DataFrame, p: Double, name: String): DataFrame = {
      val pos = (col("__n") - 1) * lit(p)
      val k = floor(pos).cast("long") + 1
      val frac = pos - floor(pos)
      val vLo = max(when(col("__rn") === k, col(valueCol))).over(wAll)
      val vHi = max(when(col("__rn") === k + 1, col(valueCol))).over(wAll)
      tagged.withColumn(name,
        vLo + (coalesce(vHi, vLo) - vLo) * frac)
    }
    val tagged = df.filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
    Seq(0.25 -> "q1", 0.5 -> "med", 0.75 -> "q3")
      .foldLeft(tagged) { case (acc, (p, name)) => quantile(acc, p, name) }
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("v_min"), min(col("q1")).as("q1"),
        min(col("med")).as("med"), min(col("q3")).as("q3"),
        max(col(valueCol)).as("v_max"))
  }

  /** Fixed-width histogram per group: bucket = floor((v − lo) / width),
    * clamped into [0, nBuckets−1]. The bucket arithmetic is two
    * single-rounded FP ops + an exact floor — identical in any engine —
    * and the outputs are integer counts. One hash aggregate; empty
    * buckets are omitted (join a spine downstream if a dense grid is
    * needed).
    */
  def histogram(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lo: Double,
      width: Double,
      nBuckets: Int): DataFrame = {
    require(width > 0 && nBuckets > 0)
    val raw = floor((col(valueCol) - lit(lo)) / lit(width))
    val bucket = least(greatest(raw, lit(0.0)), lit((nBuckets - 1).toDouble))
      .cast("int")
    // NaN is dropped alongside null: it passes isNotNull but its bucket
    // placement via least/greatest is engine-dependent (Spark orders NaN
    // largest; IEEE comparisons say neither) — excluding it keeps the
    // bitwise oracle contract.
    df.filter(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")))
      .groupBy(groupCols.map(col) :+ bucket.as("bucket"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Equi-depth histogram per group: `nBuckets` buckets of (near-)equal
    * row count via ntile over a TOTAL order — the value plus a unique
    * tie-break key, so bucket boundaries are bit-identical in any
    * engine even with duplicate values. Emits per bucket the count and
    * the inclusive [lo, hi] value range. The within-group sort is the
    * cost (ntile needs the group's total order); per-group windows keep
    * it partition-parallel, and at corpus scale the approximate-quantile
    * certificate (q_approx_quantile) is the cheap alternative — this is
    * the exact formulation.
    */
  def equidepthHistogram(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tieCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol), col(tieCol))
    // NaN dropped alongside null — the sibling histogram's bitwise-
    // oracle discipline (NaN ordering is engine-dependent)
    df.filter(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")))
      .withColumn("bucket", ntile(nBuckets).over(w))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("v_lo"), max(col(valueCol)).as("v_hi"))
  }

  /** Ordered funnel (the ClickHouse windowFunnel shape, strict ordering):
    * per entity, stage k is reached iff the EARLIEST occurrence of each
    * stage is strictly later than the previous stage's earliest
    * occurrence. One conditional-min aggregate per entity (single
    * shuffle), then a count per depth — timestamps compare exactly, so
    * the result is deterministic.
    */
  def funnel(
      df: DataFrame,
      entityCol: String,
      stageCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val minCols = stages.map(s0 =>
      min(when(col(stageCol) === s0, col(tsCol))).as(s"__t_$s0"))
    val mins = df.groupBy(col(entityCol)).agg(minCols.head, minCols.tail: _*)
    // depth = number of stages reached in strict order
    val depth = stages.zipWithIndex.tail.foldLeft(
      when(col(s"__t_${stages.head}").isNotNull, 1).otherwise(0)) {
      case (acc, (s0, i)) =>
        when(acc === i && col(s"__t_$s0") > col(s"__t_${stages(i - 1)}"), i + 1)
          .otherwise(acc)
    }
    mins.select(col(entityCol), depth.as("depth"))
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_entities"))
  }

  /** Wilcoxon signed-rank statistic (Wilcoxon 1945) over paired
    * integer observations, ALL-INTEGER: zero differences drop (the
    * standard treatment), |d| ties take AVERAGE ranks — kept exact by
    * emitting DOUBLED ranks (avg·2 = min_rn + max_rn of the tie run, so
    * no .5 ever materializes) — and the emitted `w_plus_x2`/`w_minus_x2`
    * satisfy w_plus_x2 + w_minus_x2 = n(n+1) exactly, the built-in
    * self-check. The nonparametric paired-difference test next to
    * [[graft.queries]]' Mann–Whitney (unpaired) leg.
    *
    * The rank windows run per key over the paired series — bounded by
    * the spine (days), not the corpus; with `keyCols` empty they are
    * single-partition windows over that same bounded frame (the day
    * spine is the documented exception to the no-global-window rule).
    */
  def wilcoxonSignedRank(
      pairs: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val nz = pairs
      .withColumn("__d", col(xCol) - col(yCol))
      .filter(col("__d") =!= 0)
      .withColumn("__ad", abs(col("__d")))
    val wRn = Window.partitionBy(keys: _*).orderBy(col("__ad").asc)
    val wTie = Window.partitionBy(keys :+ col("__ad"): _*)
    nz
      .withColumn("__rn", row_number().over(wRn).cast("long"))
      .withColumn("__rank_x2", min(col("__rn")).over(wTie) + max(col("__rn")).over(wTie))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__d") > 0, col("__rank_x2")).otherwise(0L)).as("w_plus_x2"),
        sum(when(col("__d") < 0, col("__rank_x2")).otherwise(0L)).as("w_minus_x2"))
  }

  /** Two-sample Kolmogorov–Smirnov distance (the distribution-equality
    * screen run before pooling two cohorts), EXACT by
    * cross-multiplication: D = max_v |F_A(v) − F_B(v)| is computed as
    * `d_num` = max|cumA·n₂ − cumB·n₁| over the merged value spine, so
    * no IEEE division enters the max; `d_pm` = (1000·d_num) div (n₁·n₂)
    * is the per-mille rendering. One value-level aggregate, one
    * per-key cumulative window (the q_mannwhitney shape), one rollup.
    * Loud past n₁,n₂ = 10⁹ where the cumulative cross-products
    * cumA·n₂ would leave BIGINT (the passAtK discipline); the final
    * per-mille divide runs in DECIMAL(38,0) because d_num itself can
    * equal n₁·n₂ (fully separated samples), so 1000·d_num leaves
    * BIGINT far below the cross-product bound.
    */
  def ksTwoSample(
      df: DataFrame,
      keyCols: Seq[String],
      inACol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val maxN = 1000000000L
    val perV = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(sum(when(col(inACol), 1L).otherwise(0L)).as("__a"),
        sum(when(col(inACol), 0L).otherwise(1L)).as("__b"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    perV
      .withColumn("__ca", sum(col("__a")).over(wCum))
      .withColumn("__cb", sum(col("__b")).over(wCum))
      .withColumn("n1", sum(col("__a")).over(wAll))
      .withColumn("n2", sum(col("__b")).over(wAll))
      .groupBy(keys: _*)
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("__ca") * col("n2") - col("__cb") * col("n1"))).as("d_num"))
      .withColumn("d_pm",
        when(col("n1") > maxN || col("n2") > maxN,
          raise_error(lit(s"ksTwoSample: sample size exceeds exact BIGINT bound $maxN")).cast("long"))
          .when(col("n1") === 0 || col("n2") === 0, 0L)
          // d_num ≤ n1·n2, so 1000·d_num can exceed BIGINT once
          // n1·n2 > Long.Max/1000 ≈ 9.2·10¹⁵ — well under the 10⁹
          // cross-product guard above. DECIMAL(38,0) keeps the
          // per-mille exact over the whole guarded envelope; the
          // quotient is ≤ 1000 so the div's LONG result is safe.
          .otherwise(expr(
            "(1000 * CAST(d_num AS DECIMAL(38,0))) div (CAST(n1 AS DECIMAL(38,0)) * n2)")))
  }

  /** Two-sample Kuiper statistic (Kuiper 1960) — the member of the
    * two-sample row that treats BOTH tails symmetrically: V = D⁺ + D⁻,
    * the sup of F_A − F_B PLUS the sup of F_B − F_A, where KS keeps
    * only the larger. On a circular domain (hour-of-day, day-of-week)
    * V is invariant to rotations of the origin, which makes it the
    * canonical drift test for cyclic covariates; on the line it flags
    * the "A shifted left in one tail, right in the other" pattern a
    * single sup halves. Same exact cross-multiplied spine as
    * [[ksTwoSample]]: with Δ(v) = cumA·n₂ − cumB·n₁, `dplus_num` =
    * max(Δ) and `dminus_num` = max(−Δ) (the spine's last row has
    * Δ = 0, so both maxes are ≥ 0 without a clamp; the lit(0)
    * greatest() is belt for a vacuous side), and `v_pm` =
    * (1000·(D⁺+D⁻)) div (n₁·n₂) in DECIMAL(38,0) — V can reach 2, so
    * v_pm tops out at 2000. Guard and cost identical to KS.
    */
  def kuiper(
      df: DataFrame,
      keyCols: Seq[String],
      inACol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val maxN = 1000000000L
    val perV = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(sum(when(col(inACol), 1L).otherwise(0L)).as("__a"),
        sum(when(col(inACol), 0L).otherwise(1L)).as("__b"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    perV
      .withColumn("__ca", sum(col("__a")).over(wCum))
      .withColumn("__cb", sum(col("__b")).over(wCum))
      .withColumn("n1", sum(col("__a")).over(wAll))
      .withColumn("n2", sum(col("__b")).over(wAll))
      .withColumn("__d", col("__ca") * col("n2") - col("__cb") * col("n1"))
      .groupBy(keys: _*)
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        greatest(max(col("__d")), lit(0L)).as("dplus_num"),
        greatest(max(-col("__d")), lit(0L)).as("dminus_num"))
      .withColumn("v_pm",
        when(col("n1") > maxN || col("n2") > maxN,
          raise_error(lit(s"kuiper: sample size exceeds exact BIGINT bound $maxN"))
            .cast("long"))
          .when(col("n1") === 0 || col("n2") === 0, 0L)
          .otherwise(expr(
            """(1000 * (CAST(dplus_num AS DECIMAL(38,0)) + dminus_num))
               div (CAST(n1 AS DECIMAL(38,0)) * n2)""")))
  }

  /** Two-sample Cramér–von Mises statistic (Anderson 1962) — the L2
    * companion to [[ksTwoSample]]'s sup metric: T = n₁n₂/N² ·
    * Σ_pooled (F₁ − F₂)², which weights EVERY ECDF gap instead of only
    * the largest, so distributed discrepancies KS underweights show
    * up. Exact by cross-multiplication over the same value spine:
    * with Δ(v) = cumA·n₂ − cumB·n₁ and point mass m(v),
    * T = Σ m·Δ² / (N²·n₁·n₂), emitted as
    * `t_x1000` = (1000·Σm·Δ²) div (N²·n₁·n₂) with the squares in
    * DECIMAL(38,0). The per-row product m·Δ² grows ~N⁵/16, so the
    * EXACT envelope is N = n₁+n₂ < (16·10³⁸)^⅕ ≈ 6.9·10⁷ — far below
    * KS's 10⁹ cross-product bound — and the guard is per side:
    * n₁, n₂ ≤ 3·10⁷ (N ≤ 6·10⁷ ⇒ N⁵/16 < 4.9·10³⁷ < 10³⁸). Past the
    * envelope non-ANSI Spark NULLs the per-row product and `sum`
    * would silently skip it, so beyond the loud size guard the
    * aggregate also COUNTS null per-row terms and raises if any row
    * overflowed — per-row overflow can never silently shed mass
    * (loudLong only sees the final accumulator). Same one-aggregate +
    * one-cumulative-window cost as KS.
    */
  def cramerVonMises(
      df: DataFrame,
      keyCols: Seq[String],
      inACol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    // per-SIDE bound: N = n1+n2 ≤ 2·maxN = 6·10⁷ keeps the per-row
    // product m·Δ² ≤ N⁵/16 < 10³⁸ (see scaladoc) — NOT the KS 10⁹
    val maxN = 30000000L
    val perV = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(sum(when(col(inACol), 1L).otherwise(0L)).as("__a"),
        sum(when(col(inACol), 0L).otherwise(1L)).as("__b"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    perV
      .withColumn("__ca", sum(col("__a")).over(wCum))
      .withColumn("__cb", sum(col("__b")).over(wCum))
      .withColumn("n1", sum(col("__a")).over(wAll))
      .withColumn("n2", sum(col("__b")).over(wAll))
      .withColumn("__d",
        (col("__ca").cast(dec) * col("n2") - col("__cb").cast(dec) * col("n1")))
      .withColumn("__term",
        (col("__a") + col("__b")).cast(dec) * col("__d") * col("__d"))
      .groupBy(keys: _*)
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(col("__term")).as("__t_num"),
        // per-row DECIMAL overflow nulls the term and sum() would skip
        // it SILENTLY — count and raise instead (loudLong can't see it)
        sum(when(col("__term").isNull, 1L).otherwise(0L)).as("__null_terms"))
      .withColumn("t_x1000",
        when(col("n1") > maxN || col("n2") > maxN,
          raise_error(lit(s"cramerVonMises: sample size exceeds exact bound $maxN"))
            .cast("long"))
          .when(col("__null_terms") > 0,
            raise_error(lit("cramerVonMises: per-row m*delta^2 overflowed DECIMAL(38,0)"))
              .cast("long"))
          .when(col("n1") === 0 || col("n2") === 0, 0L)
          .otherwise(loudLong(
            ((col("__t_num") * 1000
              - col("__t_num") * 1000
                % ((col("n1") + col("n2")).cast(dec) * (col("n1") + col("n2"))
                  * col("n1") * col("n2")))
              / ((col("n1") + col("n2")).cast(dec) * (col("n1") + col("n2"))
                * col("n1") * col("n2"))).cast(dec),
            "cramerVonMises", "t_x1000")))
      .drop("__t_num", "__null_terms")
  }

  /** Two-sample Anderson–Darling statistic (Pettitt 1976; the k=2,
    * no-midrank form of Scholz–Stephens 1987 eq. 3) — the
    * tail-weighted member of the two-sample row: where
    * [[cramerVonMises]] weights every ECDF gap equally, AD divides
    * each gap by B·(N−B), so discrepancies in the distribution TAILS
    * (where B(N−B) is small) dominate — the test a heavy-tail drift
    * monitor wants. Over the pooled distinct-value spine with tie
    * mass l(v), cumulative pool count B(v) and cumulative A-count
    * M(v), with Δ(v) = N·M(v) − n₁·B(v):
    *   A² = (1/(n₁·n₂)) · Σ_{v: B(v)<N} l(v)·Δ(v)² / (B(v)·(N−B(v)))
    * (the last spine row B=N is excluded — its weight is 0/0 and
    * every textbook form drops it). Emitted `a2_x1000` by the
    * two-stage floor rendering: each term floors ONCE at ×1000
    * (`(1000·l·Δ²) div (B·(N−B))` — denominators vary per row, so a
    * common-denominator single division does not exist), the term sum
    * then floors ONCE by n₁·n₂. Both floors replay bit-identically in
    * DuckDB HUGEINT. Per-row bound: |Δ| ≤ n₁·n₂ ⇒ 1000·l·Δ² ≤
    * 1000·N⁵/16, inside DECIMAL(38,0) for N ≤ 1.6·10⁷ (1000·N⁵/16 =
    * 6.6·10³⁷ < 10³⁸) — guard per side n₁, n₂ ≤ maxN = 8·10⁶ and,
    * like CvM, COUNT nulled per-row terms
    * and raise (sum() would silently skip an overflowed row). Same
    * one-aggregate + one-cumulative-window cost as KS/CvM.
    */
  def andersonDarling(
      df: DataFrame,
      keyCols: Seq[String],
      inACol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val maxN = 8000000L
    val perV = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(sum(when(col(inACol), 1L).otherwise(0L)).as("__a"),
        sum(when(col(inACol), 0L).otherwise(1L)).as("__b"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    perV
      .withColumn("__ca", sum(col("__a")).over(wCum))
      .withColumn("__cb", sum(col("__b")).over(wCum))
      .withColumn("n1", sum(col("__a")).over(wAll))
      .withColumn("n2", sum(col("__b")).over(wAll))
      .withColumn("__bb", col("__ca") + col("__cb"))
      .withColumn("__d",
        (col("n1") + col("n2")).cast(dec) * col("__ca")
          - col("n1").cast(dec) * col("__bb"))
      // last spine row (B = N) excluded: Δ there is identically 0 and
      // the weight B·(N−B) is 0 — NULL the term so the null-count
      // guard below never fires on it
      .withColumn("__term",
        when(col("__bb") === col("n1") + col("n2"), lit(null).cast(dec))
          .otherwise(
            ((col("__a") + col("__b")).cast(dec) * col("__d") * col("__d") * 1000
              - (col("__a") + col("__b")).cast(dec) * col("__d") * col("__d") * 1000
                % (col("__bb").cast(dec) * (col("n1") + col("n2") - col("__bb"))))
              / (col("__bb").cast(dec) * (col("n1") + col("n2") - col("__bb")))))
      .withColumn("__last", when(col("__bb") === col("n1") + col("n2"), 1L).otherwise(0L))
      .groupBy(keys: _*)
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(col("__term")).as("__s"),
        sum(when(col("__term").isNull, 1L).otherwise(0L)).as("__null_terms"),
        sum(col("__last")).as("__n_last"))
      .withColumn("a2_x1000",
        when(col("n1") > maxN || col("n2") > maxN,
          raise_error(lit(s"andersonDarling: sample size exceeds exact bound $maxN"))
            .cast("long"))
          // exactly ONE null term is legitimate: the B=N spine row
          .when(col("__null_terms") > col("__n_last"),
            raise_error(lit("andersonDarling: per-row l*delta^2 overflowed DECIMAL(38,0)"))
              .cast("long"))
          .when(col("n1") === 0 || col("n2") === 0, 0L)
          .otherwise(loudLong({
            // single-distinct-value pool: only the excluded B=N row
            // exists, sum() is NULL — the statistic is 0 by convention
            val s = coalesce(col("__s"), lit(0).cast(dec))
            ((s - s % (col("n1").cast(dec) * col("n2")))
              / (col("n1").cast(dec) * col("n2"))).cast(dec)
          }, "andersonDarling", "a2_x1000")))
      .drop("__s", "__null_terms", "__n_last")
  }

  /** McNemar's test (1947) for PAIRED binary verdicts — do two
    * classifiers/filters disagree symmetrically? Only the discordant
    * cells carry signal: `chi2_x1000` = 1000·(n₁₀ − n₀₁)² div
    * (n₁₀ + n₀₁), exact integers, 0 when no discordant pairs (the
    * statistic is undefined and "no signal" is the portable
    * rendering). Emits the full 2×2 for the audit trail. ONE aggregate.
    */
  def mcnemar(
      df: DataFrame,
      keyCols: Seq[String],
      aCol: String,
      bCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val a = col(aCol)
    val b = col(bCol)
    df.groupBy(keys: _*)
      .agg(sum(when(!a && !b, 1L).otherwise(0L)).as("n00"),
        sum(when(!a && b, 1L).otherwise(0L)).as("n01"),
        sum(when(a && !b, 1L).otherwise(0L)).as("n10"),
        sum(when(a && b, 1L).otherwise(0L)).as("n11"))
      .withColumn("chi2_x1000",
        when(col("n01") + col("n10") === 0, 0L).otherwise(
          expr("(1000 * (n10 - n01) * (n10 - n01)) div (n10 + n01)")))
  }

  /** Cochran's Q test (1950) — the k-treatment generalization of
    * McNemar: do k binary filters pass the same subjects at the same
    * rate? Q = (k−1)·(k·ΣC_j² − S²) / (k·S − ΣR_i²) with C_j the
    * per-treatment pass counts, R_i the per-subject pass counts, S the
    * grand total — ALL integer, emitted as `q_x1000` by floor
    * division (0 when the denominator is 0: every subject all-pass or
    * all-fail, no information). ONE aggregate over the subject rows:
    * S, ΣC_j², and ΣR_i² all fold in the same pass.
    */
  def cochranQ(
      df: DataFrame,
      keyCols: Seq[String],
      verdictCols: Seq[String]): DataFrame = {
    require(verdictCols.size >= 2, "Cochran's Q needs k >= 2 treatments")
    val keys = keyCols.map(col)
    val k = verdictCols.size
    val vs = verdictCols.map(c => when(col(c), 1L).otherwise(0L))
    val rI = vs.reduce(_ + _)
    val cSums = verdictCols.zipWithIndex.map { case (c, i) =>
      sum(when(col(c), 1L).otherwise(0L)).as(s"__c$i")
    }
    val sumCsq = (0 until k).map(i => col(s"__c$i") * col(s"__c$i")).reduce(_ + _)
    df.withColumn("__r", rI)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_subjects"),
        sum(col("__r")).as("s_total") +:
          sum(col("__r") * col("__r")).as("sum_r2") +: cSums: _*)
      .withColumn("k", lit(k.toLong))
      .withColumn("sum_c_sq", sumCsq)
      .withColumn("q_x1000",
        when(col("k") * col("s_total") - col("sum_r2") === 0, 0L).otherwise(
          expr(s"(1000 * ${k - 1} * ($k * sum_c_sq - s_total * s_total))" +
            s" div ($k * s_total - sum_r2)")))
      .select(keys ++ Seq(col("n_subjects"), col("k"), col("s_total"),
        col("sum_c_sq"), col("sum_r2"), col("q_x1000")): _*)
  }

  /** Friedman test (1937) — the k-treatment repeated-measures rank
    * test: within every complete block (a block supplying EXACTLY one
    * row per treatment; incomplete blocks drop) treatments take
    * doubled midranks (min+max of the tie run — integral always), and
    * χ²_F·1000 = (3000·ΣR₂ⱼ²) div (n·k·(k+1)) − 3000·n·(k+1) with
    * R₂ⱼ the doubled per-treatment rank sums (Σd² = ΣR₂²/4 folded
    * into the constants). Kendall's W = χ²_F/(n(k−1)) rides along as
    * `w_pm`. Emits one row per treatment (its n_blocks and R₂ⱼ) with
    * the key-level statistic repeated — the audit-friendly shape.
    * When every rank sum is equal the first term divides EXACTLY
    * (ΣR₂² = k·(n(k+1))²), so χ²_F = 0 with no floor artifact.
    *
    * Scale shape: the rank windows are per-block (k rows each); the
    * heavy stage is the one groupBy producing blocks — data-sized,
    * partial-agg. k comes from a 1-row broadcast, never a collect.
    */
  def friedman(
      df: DataFrame,
      blockCol: String,
      treatCol: String,
      vCol: String): DataFrame = {
    // Three consumers (k, block sizes, the ranked rows) of one
    // block-bounded frame: pin it once so the upstream rollup — and
    // the corpus scan under it — runs ONCE, not 3× (the q_rfm
    // localCheckpoint pattern).
    val pinned = df.select(col(blockCol), col(treatCol), col(vCol))
      .localCheckpoint(true)
    val kDf = pinned.agg(countDistinct(col(treatCol)).as("k"))
    // k rows AND k distinct treatments (duplicate+missing cancels in the
    // row count alone — the quade r15 advice, applied to the whole family)
    val nb = pinned.groupBy(col(blockCol))
      .agg(count(lit(1)).as("__nb"), countDistinct(col(treatCol)).as("__nt"))
    val complete = pinned
      .join(nb, blockCol)
      .crossJoin(broadcast(kDf))
      .filter(col("__nb") === col("k") && col("__nt") === col("k"))
    val wV = Window.partitionBy(col(blockCol)).orderBy(col(vCol).asc)
    val wTie = Window.partitionBy(col(blockCol), col(vCol))
    val ranked = complete
      .withColumn("__rn", row_number().over(wV).cast("long"))
      .withColumn("__r2", min(col("__rn")).over(wTie) + max(col("__rn")).over(wTie))
    // |treatments| rows feeding BOTH the global rollup and the final
    // cross join — pin so the rank windows execute once, not twice.
    val perTreat = ranked.groupBy(col(treatCol))
      .agg(count(lit(1)).as("n_blocks"), sum(col("__r2")).as("r2_sum"),
        max(col("k")).as("k"))
      .localCheckpoint(true)
    val global = perTreat
      .agg(sum(col("r2_sum") * col("r2_sum")).as("__sum_r2sq"),
        max(col("n_blocks")).as("__n"), max(col("k")).as("__k"))
    perTreat.crossJoin(broadcast(global))
      .withColumn("chi2f_x1000",
        when(col("__n") === 0, 0L).otherwise(
          expr("(3000 * __sum_r2sq) div (__n * __k * (__k + 1))")
            - lit(3000L) * col("__n") * (col("__k") + 1)))
      .withColumn("w_pm",
        when(col("__n") === 0 || col("__k") < 2, 0L)
          .otherwise(expr("chi2f_x1000 div (__n * (__k - 1))")))
      .select(col(treatCol), col("n_blocks"), col("r2_sum"), col("k"),
        col("chi2f_x1000"), col("w_pm"))
  }

  /** Quade test (1979) — [[friedman]] weighted by block INFORMATIVENESS:
    * blocks with a wider value range carry more signal, so each
    * within-block doubled midrank deviation (r₂ − (k+1)) is weighted by
    * the block's doubled range-rank q₂ (block ranges ranked across
    * blocks, ties by midrank). With S₄ᵢⱼ = q₂ᵢ·(r₂ᵢⱼ − (k+1)) — 4× the
    * textbook Sᵢⱼ, the factor cancels — the statistic is
    * `quade_x1000` = (1000·(n−1)·Σⱼ(ΣᵢS₄)²) div (n·ΣᵢⱼS₄² − Σⱼ(ΣᵢS₄)²),
    * exact integers end to end; a zero denominator (perfect treatment
    * agreement in every block) emits 0, documented like friedman's
    * all-tied case. Incomplete blocks drop (the friedman discipline).
    * Products grow ~n³k³, so they ride DECIMAL(38,0) with the %-trick
    * floor division and loud cast-down. The block-level range-rank
    * window runs over the CALENDAR-bounded block frame (the day-spine
    * exception).
    */
  def quade(
      df: DataFrame,
      blockCol: String,
      treatCol: String,
      vCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val pinned = df.select(col(blockCol), col(treatCol), col(vCol))
      .localCheckpoint(true)
    val kDf = pinned.agg(countDistinct(col(treatCol)).as("k"))
    // completeness = k rows AND k DISTINCT treatments: a block with a
    // duplicated treatment plus a missing one has __nb = k but __nt < k
    // and must drop — row count alone silently admits it and distorts
    // the within-block ranks (r15 advice)
    val nbDf = pinned.groupBy(col(blockCol))
      .agg(count(lit(1)).as("__nb"), countDistinct(col(treatCol)).as("__nt"))
    // two consumers (within-block ranks, block ranges) — pin once
    val complete = pinned
      .join(nbDf, blockCol)
      .crossJoin(broadcast(kDf))
      .filter(col("__nb") === col("k") && col("__nt") === col("k"))
      .localCheckpoint(true)
    val wV = Window.partitionBy(col(blockCol)).orderBy(col(vCol).asc)
    val wTie = Window.partitionBy(col(blockCol), col(vCol))
    val ranked = complete
      .withColumn("__rn", row_number().over(wV).cast("long"))
      .withColumn("__r2", min(col("__rn")).over(wTie) + max(col("__rn")).over(wTie))
    val wDOrd = Window.orderBy(col("__d").asc)
    val wDTie = Window.partitionBy(col("__d"))
    // row_number's order within a range tie is arbitrary, but the
    // doubled midrank min+max over the tie run is tie-order-INVARIANT
    val q2d = complete.groupBy(col(blockCol))
      .agg((max(col(vCol)) - min(col(vCol))).as("__d"))
      .withColumn("__qrn", row_number().over(wDOrd).cast("long"))
      .withColumn("__q2", min(col("__qrn")).over(wDTie) + max(col("__qrn")).over(wDTie))
      .select(col(blockCol), col("__q2"))
    val perTreat = ranked.join(q2d, blockCol)
      .withColumn("__s4", col("__q2").cast(dec) * (col("__r2") - (col("k") + 1)))
      .groupBy(col(treatCol))
      .agg(count(lit(1)).as("n_blocks"), max(col("k")).as("k"),
        sum(col("__s4")).as("__s4j"),
        sum(col("__s4") * col("__s4")).as("__a16j"))
      .localCheckpoint(true)
    val global = perTreat.agg(sum(col("__a16j")).as("__a16"),
      sum(col("__s4j") * col("__s4j")).as("__b16n"),
      max(col("n_blocks")).as("__n"))
    perTreat.crossJoin(broadcast(global))
      .withColumn("s4_sum", loudLong(col("__s4j"), "quade", "s4_sum"))
      .withColumn("__den", col("__n").cast(dec) * col("__a16") - col("__b16n"))
      .withColumn("quade_x1000",
        when(col("__n") === 0 || col("__den") === 0, 0L).otherwise(
          loudLong(
            ((col("__b16n") * (col("__n") - 1) * 1000
              - col("__b16n") * (col("__n") - 1) * 1000 % col("__den"))
              / col("__den")).cast(dec),
            "quade", "quade_x1000")))
      .select(col(treatCol), col("n_blocks"), col("k"), col("s4_sum"),
        col("quade_x1000"))
  }

  /** Cramér's V effect size over an r×c contingency table: the global
    * χ²·1000 = Σ_cells (1000·(N·O − R·C)²) div (N·R·C) — per-cell floor
    * then sum, both engines replaying identically; products run in
    * DECIMAL(38,0) ((N·O)² passes BIGINT at N > ~10⁵) with a loud
    * raise_error past N = 10⁸ where N⁴·1000 would leave 38 digits.
    * ZERO cells are materialized (marginal cross join — |r|·|c| is
    * category-sized, broadcast) because an empty cell still contributes
    * its full expectation to χ². `v2_x1e6` = V²·10⁶ = χ²/(N·(min(r,c)−1))
    * — squared so no root enters; 0 when the table is degenerate
    * (single row or column: no association is measurable).
    */
  def cramersV(
      df: DataFrame,
      rowCol: String,
      colCol: String): DataFrame =
    cramersVFromCounts(
      df.groupBy(col(rowCol).as("__r"), col(colCol).as("__c"))
        .agg(count(lit(1)).as("__o")))

  /** [[cramersV]] over a PRE-COUNTED contingency frame
    * `(__r, __c, __o)` — the entry point for callers that already hold
    * per-cell counts (q_median_test derives them from its pinned
    * value spine, so the raw table is scanned ONCE for the whole
    * composition). The cell table is category-sized: pin it once and
    * every marginal leg reads the materialization, not the corpus.
    */
  def cramersVFromCounts(cellCounts: DataFrame): DataFrame = {
    val maxN = 100000000L
    val cells = cellCounts.localCheckpoint(true)
    val rTot = cells.groupBy(col("__r")).agg(sum(col("__o")).as("__rt"))
    val cTot = cells.groupBy(col("__c")).agg(sum(col("__o")).as("__ct"))
    val tot = cells.agg(sum(col("__o")).as("__n"),
      countDistinct(col("__r")).as("n_rows"),
      countDistinct(col("__c")).as("n_cols"))
    rTot.crossJoin(cTot)
      // the cell table is bounded by the category space — broadcast it
      // explicitly rather than trusting AQE to demote the SMJ (it
      // reliably does only when the pinned stats survive reuse)
      .join(broadcast(cells), Seq("__r", "__c"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("__contrib",
        when(col("__n") > maxN, raise_error(
          lit(s"cramersV: N exceeds exact-decimal bound $maxN")).cast("long"))
          .otherwise(expr(
            """(1000 * (CAST(__n AS DECIMAL(38,0)) * __o - CAST(__rt AS DECIMAL(38,0)) * __ct)
               * (CAST(__n AS DECIMAL(38,0)) * __o - CAST(__rt AS DECIMAL(38,0)) * __ct))
               div (CAST(__n AS DECIMAL(38,0)) * __rt * __ct)""").cast("long")))
      .groupBy()
      .agg(max(col("__n")).as("n_total"), max(col("n_rows")).as("n_rows"),
        max(col("n_cols")).as("n_cols"), sum(col("__contrib")).as("chi2_x1000"))
      .withColumn("v2_x1e6",
        when(least(col("n_rows"), col("n_cols")) < 2, 0L).otherwise(
          expr("(chi2_x1000 * 1000) div (n_total * (least(n_rows, n_cols) - 1))")))
  }

  /** Jonckheere–Terpstra test (1954) for ORDERED alternatives — does
    * the response rise monotonically across k a-priori-ordered groups
    * (dose levels, priority tiers, model sizes)? J = Σ_{g<h} U_{gh};
    * kept integral by the doubled rendering J₂ = Σ 2·#{v_g < v_h} +
    * #{v_g = v_h}. Groups are ranks 1..k in `groupRankCol`.
    * `ej_x2` = (N² − Σn_g²) div 2 is the doubled null expectation, so
    * `j_excess_x2` = J₂ − E[J₂] reads as a signed exact deviation
    * (positive = rising with group order).
    *
    * Scale shape: per-value group counts pivot to k columns (k is a
    * roster, not data), then ONE distributed grouped prefix-sum
    * ([[PrefixSum.runningTotals]] — never a global window) gives every
    * strictly-below cumulative; J₂ folds in a single projection +
    * single-row rollup.
    */
  def jonckheere(
      df: DataFrame,
      groupRankCol: String,
      vCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"need at least 2 ordered groups, got $k")
    // Pin the pivoted value spine: the prefix-sum's boundary-sampling
    // pass and the cumulative pass both read the materialization
    // instead of re-running the pivot (and its corpus scan).
    val perV = df
      .groupBy(col(vCol).as("__v"))
      .pivot(groupRankCol, (1 to k).map(Integer.valueOf))
      .count()
      .na.fill(0L)
      .select(col("__v") +: (1 to k).map(g => col(s"$g").as(s"m_$g")): _*)
      .localCheckpoint(true)
    val cum = PrefixSum.runningTotals(perV, "__v", (1 to k).map(g => s"m_$g"))
    // contribution of the rows in group h at value v:
    //   m_h · Σ_{g<h} (2·below_g + eq_g),  below_g = cum_g − m_g
    val contrib = (2 to k).map { h =>
      val inner = (1 until h).map { g =>
        lit(2L) * (col(s"cum_m_$g") - col(s"m_$g")) + col(s"m_$g")
      }.reduce(_ + _)
      col(s"m_$h") * inner
    }.reduce(_ + _)
    val ns = (1 to k).map(g => sum(col(s"m_$g")).as(s"n_$g"))
    val rolled = cum
      .withColumn("__c", contrib)
      .agg(sum(col("__c")).as("j_x2"), ns: _*)
    val nTotal = (1 to k).map(g => col(s"n_$g")).reduce(_ + _)
    val sumNsq = (1 to k).map(g => col(s"n_$g") * col(s"n_$g")).reduce(_ + _)
    rolled
      .withColumn("n_total", nTotal)
      .withColumn("ej_x2", expr("(n_total * n_total - (" +
        (1 to k).map(g => s"n_$g * n_$g").mkString(" + ") + ")) div 2"))
      .withColumn("j_excess_x2", col("j_x2") - col("ej_x2"))
      .select(Seq(col("n_total"), col("j_x2"), col("ej_x2"),
        col("j_excess_x2")) ++ (1 to k).map(g => col(s"n_$g")): _*)
  }

  /** Page's trend test (1963) for ORDERED treatments in blocks — the
    * repeated-measures cousin of [[jonckheere]]: within every complete
    * block the treatments take doubled midranks, and
    * L₂ = Σ_j j·R₂ⱼ weights rank sums by the a-priori treatment order
    * (j = `treatRankCol`, 1..k). Under H₀ E[L₂] = n·k·(k+1)²/2
    * exactly, so `l_excess_x2` = L₂ − E[L₂] is a signed exact
    * deviation (positive = response rises with treatment order).
    * Blocks missing a treatment drop (the [[friedman]] completeness
    * rule; one row per (key, block, treatment) assumed).
    */
  def pageTrend(
      df: DataFrame,
      keyCols: Seq[String],
      blockCol: String,
      treatRankCol: String,
      vCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"need at least 2 ordered treatments, got $k")
    val keys = keyCols.map(col)
    val pinned = df
      .select(keys :+ col(blockCol).as("__blk") :+
        col(treatRankCol).as("__j") :+ col(vCol).as("__v"): _*)
      .localCheckpoint(true)
    val nb = pinned.groupBy(keys :+ col("__blk"): _*)
      .agg(count(lit(1)).as("__nb"), countDistinct(col("__j")).as("__nt"))
    val complete = pinned.join(nb, keyCols :+ "__blk")
      .filter(col("__nb") === k && col("__nt") === k)
    val wV = Window.partitionBy(keys :+ col("__blk"): _*).orderBy(col("__v").asc)
    val wTie = Window.partitionBy(keys :+ col("__blk") :+ col("__v"): _*)
    complete
      .withColumn("__rn", row_number().over(wV).cast("long"))
      .withColumn("__r2", min(col("__rn")).over(wTie) + max(col("__rn")).over(wTie))
      .groupBy(keys: _*)
      .agg(countDistinct(col("__blk")).as("n_blocks"),
        sum(col("__j") * col("__r2")).as("l2"))
      .withColumn("el2",
        col("n_blocks") * (k * (k + 1) * (k + 1) / 2))
      .withColumn("l_excess_x2", col("l2") - col("el2"))
  }

  /** Mood's scale test (1954) — do two samples differ in DISPERSION
    * around a common center? Each observation scores the squared
    * deviation of its rank from the mid-rank; kept integral by the
    * doubled rendering: with doubled midranks R₂, the score is
    * (R₂ − (N+1))² = 4·(R − (N+1)/2)², so `m_x12` = 3·Σ_A score and
    * `em_x12` = n₁·(N² − 1) (12·E[M]) compare exactly —
    * `m_excess_x12` positive means sample A is MORE spread. Rank
    * machinery is the q_mannwhitney per-value shape: doubled midrank
    * of a value = 2·(count below) + (count at) + 1, one value-level
    * aggregate + one per-key cumulative window.
    *
    * The score sums grow ~12·N³ (m_x12 ≤ 3·Σ score ≤ 12·N³,
    * em_x12 = n₁·(N²−1)), which leaves BIGINT at N ≈ 9·10⁵ per key —
    * so the products accumulate in DECIMAL(38,0) (exact to
    * N ≈ 2·10¹²) and cast down LOUDLY: any emitted statistic that no
    * longer fits BIGINT (or nulled out of even DECIMAL(38,0)) is a
    * raise_error, never a silent wrap — the ksTwoSample/cramersV
    * discipline.
    */
  def moodScaleTest(
      df: DataFrame,
      keyCols: Seq[String],
      inACol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val perV = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(count(lit(1)).as("__m"),
        sum(when(col(inACol), 1L).otherwise(0L)).as("__a"))
    val wOrd = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(keys: _*)
    perV
      .withColumn("__lt", coalesce(sum(col("__m")).over(wOrd), lit(0L)))
      .withColumn("__n", sum(col("__m")).over(wAll))
      .withColumn("__r2", lit(2L) * col("__lt") + col("__m") + 1L)
      // (R₂ − (N+1)) ≤ N, so the square stays in BIGINT to N ≈ 3·10⁹;
      // it is the 3·a·score SUM (≤ 12·N³) that must widen — route it
      // through DECIMAL(38,0) and cast down loudly below.
      .withColumn("__score",
        (col("__r2") - (col("__n") + 1)) * (col("__r2") - (col("__n") + 1)))
      .groupBy(keys: _*)
      .agg(sum(col("__a")).as("n1"),
        sum(col("__m") - col("__a")).as("n2"),
        sum(col("__a").cast(DecimalType(38, 0)) * col("__score") * 3)
          .as("__m_x12_d"))
      .withColumn("__em_x12_d",
        col("n1").cast(DecimalType(38, 0)) *
          ((col("n1") + col("n2")).cast(DecimalType(38, 0)) *
            (col("n1") + col("n2")) - 1))
      .withColumn("m_x12", loudLong(col("__m_x12_d"), "moodScaleTest", "m_x12"))
      .withColumn("em_x12", loudLong(col("__em_x12_d"), "moodScaleTest", "em_x12"))
      .withColumn("m_excess_x12",
        loudLong(col("__m_x12_d") - col("__em_x12_d"), "moodScaleTest", "m_excess_x12"))
      .drop("__m_x12_d", "__em_x12_d")
  }

  /** LOUD cast-down from a DECIMAL(38,0) exact accumulator to the
    * BIGINT output schema: a value past Long.MaxValue — or nulled by
    * DECIMAL(38,0) overflow itself (non-ANSI Spark nulls, it never
    * wraps decimals) — raises instead of corrupting. Shared by every
    * operator whose internal sums outgrow BIGINT before its outputs
    * plausibly do (moodScaleTest, trimmedSum).
    */
  private def loudLong(c: Column, op: String, what: String): Column =
    when(c.isNull || abs(c) > lit(Long.MaxValue).cast(DecimalType(38, 0)),
        raise_error(lit(s"$op: $what exceeds BIGINT — exact value needs a wider output type"))
          .cast("long"))
      .otherwise(c.cast("long"))

  /** Trimmed sum/mean per key — the robust aggregate between the mean
    * (0 trim) and the median (500‰ trim): drop the lowest and highest
    * `trimPm` per-mille of observations BY RANK and sum the rest,
    * EXACTLY. Tie runs crossing a cut are split by integer interval
    * intersection — a value run occupying ranks (cum−m, cum] keeps
    * `min(cum, hi) − max(cum−m, lo)` of its copies (lo = ⌊n·trimPm/1000⌋
    * ranks cut per side) — so the kept multiset is the textbook one
    * whatever the tie structure, and both engines agree. One value-
    * level aggregate + one per-key cumulative window (the
    * q_mannwhitney shape); `trimmed_mean_floor` = sum div kept rides
    * along.
    *
    * Σ(v·keep) accumulates in DECIMAL(38,0) — exact to |Σ| < 10³⁸,
    * i.e. unconditionally at any realistic key size — and casts down
    * loudly to the BIGINT `trimmed_sum` output (the moodScaleTest
    * discipline): cent-scale values × 10¹⁰-row keys sit only ~18×
    * under Long.MaxValue, too close to leave unguarded.
    */
  def trimmedSum(
      df: DataFrame,
      keyCols: Seq[String],
      vCol: String,
      trimPm: Long = 100L): DataFrame = {
    require(trimPm >= 0 && trimPm < 500, s"trim per-mille out of range: $trimPm")
    val keys = keyCols.map(col)
    val perV = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(count(lit(1)).as("__m"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    perV
      .withColumn("__cum", sum(col("__m")).over(wCum))
      .withColumn("__n", sum(col("__m")).over(wAll))
      .withColumn("__lo", expr(s"(__n * $trimPm) div 1000"))
      .withColumn("__hi", col("__n") - col("__lo"))
      .withColumn("__keep",
        greatest(lit(0L),
          least(col("__cum"), col("__hi"))
            - greatest(col("__cum") - col("__m"), col("__lo"))))
      .groupBy(keys: _*)
      .agg(max(col("__n")).as("n_obs"),
        sum(col("__keep")).as("n_kept"),
        sum(col("__v").cast(DecimalType(38, 0)) * col("__keep")).as("__ts_d"))
      .withColumn("trimmed_sum", loudLong(col("__ts_d"), "trimmedSum", "trimmed_sum"))
      .withColumn("trimmed_mean_floor",
        when(col("n_kept") === 0, 0L)
          // div over the DECIMAL accumulator: the floor-mean is within
          // the value range, so its LONG result never needs the guard.
          .otherwise(expr("__ts_d div n_kept")))
      .drop("__ts_d")
  }

  /** Winsorized sum/mean per key — [[trimmedSum]]'s CLAMPING sibling
    * (the same ⌊n·trimPm/1000⌋ ranks per side, but their values are
    * REPLACED by the cut-rank values instead of dropped, so n is
    * preserved): sum = Σ_interior v·keep + lo·v[lo+1] + (n−hi)·v[hi],
    * with v[r] the value at rank r (min v with cum ≥ r — the
    * lowerMedian idiom). ONE pinned value spine feeds the interior
    * pass AND both boundary-value picks (conditional mins in one
    * aggregate — no extra legs); the accumulator rides DECIMAL(38,0)
    * with the loud cast-down, same as the trimmed sibling.
    */
  def winsorizedSum(
      df: DataFrame,
      keyCols: Seq[String],
      vCol: String,
      trimPm: Long = 100L): DataFrame = {
    require(trimPm >= 0 && trimPm < 500, s"trim per-mille out of range: $trimPm")
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val perV = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(count(lit(1)).as("__m"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    perV
      .withColumn("__cum", sum(col("__m")).over(wCum))
      .withColumn("__n", sum(col("__m")).over(wAll))
      .withColumn("__lo", expr(s"(__n * $trimPm) div 1000"))
      .withColumn("__hi", col("__n") - col("__lo"))
      .withColumn("__keep",
        greatest(lit(0L),
          least(col("__cum"), col("__hi"))
            - greatest(col("__cum") - col("__m"), col("__lo"))))
      .groupBy(keys: _*)
      .agg(max(col("__n")).as("n_obs"), max(col("__lo")).as("n_clamped_side"),
        sum(col("__v").cast(dec) * col("__keep")).as("__interior"),
        // value at rank lo+1 / rank hi: first value whose cumulative
        // count reaches the rank — conditional mins over the same pass
        min(when(col("__cum") >= col("__lo") + 1, col("__v"))).as("__v_lo1"),
        min(when(col("__cum") >= col("__hi"), col("__v"))).as("__v_hi"))
      .withColumn("__ws",
        col("__interior")
          + col("n_clamped_side").cast(dec) * col("__v_lo1")
          + col("n_clamped_side").cast(dec) * col("__v_hi"))
      .withColumn("winsorized_sum", loudLong(col("__ws"), "winsorizedSum", "winsorized_sum"))
      .withColumn("winsorized_mean_floor",
        when(col("n_obs") === 0, 0L)
          .otherwise(expr("__ws div n_obs")))
      .select(keys ++ Seq(col("n_obs"), col("n_clamped_side"),
        col("winsorized_sum"), col("winsorized_mean_floor")): _*)
  }

  /** Tukey-fence outlier census per key (the boxplot rule, 1977):
    * count observations beyond Q1 − 1.5·IQR / Q3 + 1.5·IQR with the
    * quartiles as EXACT type-7 order statistics over integer values.
    * Everything stays integral by clearing denominators: positions
    * (n−1)/4 and 3(n−1)/4 split into rank + quarter-fraction, the
    * interpolated quartiles are emitted ×4
    * (q_x4 = (4−f)·v[r] + f·v[r+1]), and the fences ×8
    * (lo8 = 5·q1_x4 − 3·q3_x4, hi8 = 5·q3_x4 − 3·q1_x4), so the
    * census compares 8·v against them exactly — no .25 ever
    * materializes (the Wilcoxon doubled-rank discipline, doubled
    * twice). ONE pinned value spine: the rank picks are conditional
    * mins on the cumulative pass, the census re-reads the spine's
    * multiplicities — raw rows are touched once. The ×8 scaling
    * bounds the exact envelope at |v| ≤ Long.Max/8 ≈ 1.15·10¹⁸ —
    * eleven orders of magnitude above cent-scale money.
    */
  def tukeyOutliers(
      df: DataFrame,
      keyCols: Seq[String],
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val perV = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(count(lit(1)).as("__m"))
      .localCheckpoint(true)
    val wCum = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    val quart = perV
      .withColumn("__cum", sum(col("__m")).over(wCum))
      .withColumn("__n", sum(col("__m")).over(wAll))
      // type-7: position p·(n−1) in QUARTER units; rank = 1 + pos div 4,
      // frac = pos mod 4 quarters
      .withColumn("__r1", lit(1L) + expr("(__n - 1) div 4"))
      .withColumn("__f1", expr("(__n - 1) % 4"))
      .withColumn("__r3", lit(1L) + expr("(3 * (__n - 1)) div 4"))
      .withColumn("__f3", expr("(3 * (__n - 1)) % 4"))
      .groupBy(keys: _*)
      .agg(max(col("__n")).as("n_obs"),
        max(col("__f1")).as("__f1"), max(col("__f3")).as("__f3"),
        min(when(col("__cum") >= col("__r1"), col("__v"))).as("__q1lo"),
        min(when(col("__cum") >= col("__r1") + 1, col("__v"))).as("__q1hi"),
        min(when(col("__cum") >= col("__r3"), col("__v"))).as("__q3lo"),
        min(when(col("__cum") >= col("__r3") + 1, col("__v"))).as("__q3hi"))
      // rank r+1 can exceed n (f is then 0): coalesce to the lower pick
      .withColumn("q1_x4",
        (lit(4L) - col("__f1")) * col("__q1lo")
          + col("__f1") * coalesce(col("__q1hi"), col("__q1lo")))
      .withColumn("q3_x4",
        (lit(4L) - col("__f3")) * col("__q3lo")
          + col("__f3") * coalesce(col("__q3hi"), col("__q3lo")))
      .withColumn("lo_x8", lit(5L) * col("q1_x4") - lit(3L) * col("q3_x4"))
      .withColumn("hi_x8", lit(5L) * col("q3_x4") - lit(3L) * col("q1_x4"))
      .select(keys ++ Seq(col("n_obs"), col("q1_x4"), col("q3_x4"),
        col("lo_x8"), col("hi_x8")): _*)
    perV.join(quart, keyCols)
      .groupBy(keys: _*)
      .agg(max(col("n_obs")).as("n_obs"),
        max(col("q1_x4")).as("q1_x4"), max(col("q3_x4")).as("q3_x4"),
        sum(when(col("__v") * 8 < col("lo_x8"), col("__m")).otherwise(0L))
          .as("n_low"),
        sum(when(col("__v") * 8 > col("hi_x8"), col("__m")).otherwise(0L))
          .as("n_high"))
  }

  /** Median absolute deviation per key — the robust scale estimate
    * (50% breakdown) next to [[summary]]'s quartiles: both the median
    * and the MAD are LOWER medians over integer values (rank
    * ⌈n/2⌉ of the sorted multiset — no interpolation, engine-exact).
    * ONE corpus scan: the pinned per-(key, value) count spine feeds
    * both median passes, and the deviation pass re-aggregates the
    * SPINE's multiplicities (|v − med| collapses values pairwise), so
    * no pass ever revisits raw rows. The per-key cumulative windows
    * are the q_mannwhitney shape (value-level, partitioned by key).
    */
  def madPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)

    def lowerMedian(weighted: DataFrame, out: String): DataFrame = {
      val wCum = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(keys: _*)
      weighted
        .withColumn("__cm", sum(col("__mv")).over(wCum))
        .withColumn("__n", sum(col("__mv")).over(wAll))
        .filter(col("__cm") >= expr("(__n + 1) div 2"))
        .groupBy(keys: _*)
        .agg(min(col("__v")).as(out), max(col("__n")).as(s"__n_$out"))
    }

    // ONE corpus scan: the per-(key, value) count spine is pinned and
    // both median passes (and the deviation spine) read the
    // materialization — deviations carry the spine's multiplicities,
    // never the raw rows (the weighted-quantile value-spine pattern).
    val perV = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(count(lit(1)).as("__mv"))
      .localCheckpoint(true)
    val med = lowerMedian(perV, "median")
    val devSpine = perV.join(med, keyCols)
      .select(keys :+ abs(col("__v") - col("median")).as("__v") :+
        col("__mv"): _*)
      .groupBy(keys :+ col("__v"): _*)
      .agg(sum(col("__mv")).as("__mv"))
    val mad = lowerMedian(devSpine, "mad")
    med.join(mad, keyCols)
      .select(keys ++ Seq(col("__n_median").as("n_obs"), col("median"),
        col("mad")): _*)
  }

  /** [[cramersVFromCounts]] over a caller-DENSIFIED cell frame
    * `(__r, __c, __o)` — same arithmetic, ZERO extra jobs: the margins
    * and totals come from windows over the (bounded) cell frame
    * instead of three broadcast legs plus a join, so the whole χ²
    * computes inside one stage. Contract: the caller supplies every
    * (r, c) combination of the OBSERVED categories (zero cells with
    * `__o` = 0 — the 2×C splits of q_median_test emit both rows per
    * column by construction); all-zero margins are filtered so the
    * observed-category semantics match the generic path exactly. The
    * single-partition windows run over |r·c| cells — bounded by the
    * category space, never the data (the day-spine exception).
    */
  def cramersVFromDenseCounts(cells: DataFrame): DataFrame = {
    val maxN = 100000000L
    val wR = Window.partitionBy(col("__r"))
    val wC = Window.partitionBy(col("__c"))
    val wAll = Window.partitionBy()
    cells
      .withColumn("__rt", sum(col("__o")).over(wR))
      .withColumn("__ct", sum(col("__o")).over(wC))
      .filter(col("__rt") > 0 && col("__ct") > 0)
      .withColumn("__n", sum(col("__o")).over(wAll))
      .withColumn("__nr", dense_rank().over(Window.orderBy(col("__r"))))
      .withColumn("__nc", dense_rank().over(Window.orderBy(col("__c"))))
      .withColumn("__contrib",
        when(col("__n") > maxN, raise_error(
          lit(s"cramersV: N exceeds exact-decimal bound $maxN")).cast("long"))
          .otherwise(expr(
            """(1000 * (CAST(__n AS DECIMAL(38,0)) * __o - CAST(__rt AS DECIMAL(38,0)) * __ct)
               * (CAST(__n AS DECIMAL(38,0)) * __o - CAST(__rt AS DECIMAL(38,0)) * __ct))
               div (CAST(__n AS DECIMAL(38,0)) * __rt * __ct)""").cast("long")))
      .groupBy()
      .agg(max(col("__n")).as("n_total"),
        max(col("__nr")).cast("long").as("n_rows"),
        max(col("__nc")).cast("long").as("n_cols"),
        sum(col("__contrib")).as("chi2_x1000"))
      .withColumn("v2_x1e6",
        when(least(col("n_rows"), col("n_cols")) < 2, 0L).otherwise(
          expr("(chi2_x1000 * 1000) div (n_total * (least(n_rows, n_cols) - 1))")))
  }

  /** Kruskal–Wallis H (1952) — the k-sample generalization of the
    * Mann–Whitney location test: do k groups share one distribution?
    * Rank machinery is the q_mannwhitney per-value shape lifted to a
    * per-(value, group) spine: doubled midranks via ONE per-key RANGE
    * window (strictly-below + at-value sums — no join back to a
    * value-level frame), then per-group doubled rank sums S₂ⱼ.
    * With devⱼ = S₂ⱼ − nⱼ(N+1), H = 3·Σ devⱼ²/(nⱼ·N(N+1)) exactly;
    * the emitted `h_x1000` is the FLOOR-COMPOSED rendering (the
    * gunningFog convention) both engines replay identically:
    * (3000 · Σ (devⱼ² div nⱼ)) div (N(N+1)), ties by midrank, no tie
    * correction (documented; ties are few in cent-valued data).
    * devⱼ² grows ~N⁴, so the squares ride DECIMAL(38,0) with the
    * %-trick floor division (exact while quotients stay under 10³²,
    * i.e. N ≲ 10⁸ per key) and [[loudLong]] casts the statistic down.
    */
  def kruskalWallis(
      df: DataFrame,
      keyCols: Seq[String],
      gCol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val perVG = df.groupBy(keys :+ col(vCol).as("__v") :+ col(gCol).as("__g"): _*)
      .agg(count(lit(1)).as("__m"))
    val wLt = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wAt = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rangeBetween(Window.currentRow, Window.currentRow)
    val wKey = Window.partitionBy(keys: _*)
    val perG = perVG
      .withColumn("__lt", coalesce(sum(col("__m")).over(wLt), lit(0L)))
      .withColumn("__at", sum(col("__m")).over(wAt))
      .withColumn("__r2", lit(2L) * col("__lt") + col("__at") + 1L)
      .groupBy(keys :+ col("__g"): _*)
      .agg(sum(col("__m")).as("__ng"), sum(col("__m") * col("__r2")).as("__s2"))
    val dec = DecimalType(38, 0)
    perG
      .withColumn("__n", sum(col("__ng")).over(wKey))
      .withColumn("__dev",
        (col("__s2") - col("__ng") * (col("__n") + 1)).cast(dec))
      // exact floor division kept IN decimal (IntegralDivide's LONG
      // result would overflow first): dev² − (dev² mod nⱼ) is an exact
      // multiple of nⱼ, so the divide is representable
      .withColumn("__q",
        ((col("__dev") * col("__dev")
          - col("__dev") * col("__dev") % col("__ng").cast(dec))
          / col("__ng").cast(dec)).cast(dec))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("k_groups"), max(col("__n")).as("n_obs"),
        sum(col("__q")).as("__a"))
      .withColumn("h_x1000",
        when(col("k_groups") < 2 || col("n_obs") < 2, 0L).otherwise(
          loudLong(
            ((col("__a") * 3000 - col("__a") * 3000
              % (col("n_obs").cast(dec) * (col("n_obs") + 1)))
              / (col("n_obs").cast(dec) * (col("n_obs") + 1))).cast(dec),
            "kruskalWallis", "h_x1000")))
      .drop("__a")
  }

  /** Cliff's delta (1993) — the distribution-free effect size the
    * Mann–Whitney U only implies: δ = (#pairs a>b − #pairs a<b)/(n₁n₂)
    * ∈ [−1, 1]. Exactly the q_mannwhitney spine: per-value counts +
    * one per-key cumulative window give, for each value, how many B
    * observations sit strictly below/above, and the pair counts fold
    * in one aggregate — never a pair join. `delta_pm` divides in
    * DECIMAL(38,0) (1000·p_gt leaves BIGINT once n₁n₂ > 9.2·10¹⁵ —
    * the ksTwoSample lesson); truncation toward zero matches DuckDB //
    * on the signed numerator (the q_kappa discipline). The RAW
    * `p_gt`/`p_lt` audit columns are plain BIGINT pair counts — exact
    * while n₁·n₂ per key < 9.2·10¹⁸ (≈3·10⁹ observations per side),
    * the same envelope the counts themselves live in.
    */
  def cliffsDelta(
      df: DataFrame,
      keyCols: Seq[String],
      inACol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val perV = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(sum(when(col(inACol), 1L).otherwise(0L)).as("__a"),
        sum(when(col(inACol), 0L).otherwise(1L)).as("__b"))
    val wLt = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wKey = Window.partitionBy(keys: _*)
    perV
      .withColumn("__blt", coalesce(sum(col("__b")).over(wLt), lit(0L)))
      .withColumn("__nb", sum(col("__b")).over(wKey))
      .groupBy(keys: _*)
      .agg(sum(col("__a")).as("n1"), max(col("__nb")).as("n2"),
        sum(col("__a") * col("__blt")).as("p_gt"),
        // B strictly above v = total B − strictly below − at v
        sum(col("__a") * (col("__nb") - col("__blt") - col("__b"))).as("p_lt"))
      .withColumn("delta_pm",
        when(col("n1") === 0 || col("n2") === 0, 0L).otherwise(
          expr("""(1000 * (CAST(p_gt AS DECIMAL(38,0)) - p_lt))
                  div (CAST(n1 AS DECIMAL(38,0)) * n2)""")))
  }

  /** Krippendorff's alpha (1970, nominal metric) — the agreement
    * coefficient that handles MISSING ratings, which is the case
    * [[fleissKappa]] (fixed k per subject) and [[kappa]] (exactly two
    * raters) cannot express: units carry a VARIABLE number of ratings
    * m_u, units with m_u < 2 drop (they contain no pairable
    * information), and every pairable rating weighs equally. From the
    * coincidence-matrix form, with o_uc = ratings of category c in
    * unit u, n = Σ_{m_u≥2} m_u, n_c the category totals over those
    * units:
    *   α = 1 − (n−1)·[Σ_u Σ_c o_uc(m_u−o_uc)/(m_u−1)] / [Σ_c n_c(n−n_c)]
    * The only non-integer is the per-unit 1/(m_u−1); scaling by
    * S = 420 = lcm(1..7) makes `420 div (m_u−1)` EXACT for m_u ≤ 8
    * (loud above — more than 8 raters needs a bigger lcm, a stated
    * envelope, not a silent floor), so `alpha_pm` = 1000 −
    * (1000·(n−1)·Do_scaled) div (420·(n² − Σn_c²)) is one floored
    * division in DECIMAL(38,0). Σ_c n_c(n−n_c) = n² − Σn_c² folds off
    * the category totals without a second pass. Degenerate keys
    * (every rating one category ⇒ De = 0 ⇒ Do = 0 too) emit 1000.
    * Cost: one (unit, category) aggregate, one unit window for m_u,
    * one category aggregate, one bounded key-level join.
    */
  def krippendorffAlpha(
      df: DataFrame,
      keyCols: Seq[String],
      unitCol: String,
      catCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val ouc = df.groupBy(keys :+ col(unitCol).as("__u") :+ col(catCol).as("__c"): _*)
      .agg(count(lit(1)).as("__o"))
    val wUnit = Window.partitionBy(keys :+ col("__u"): _*)
    // EAGER pin (r18): `scored` feeds TWO aggregates (catTot + units),
    // and without the pin the whole upstream pipeline is planned twice
    // and stitched back by exchange reuse — which, over a caller whose
    // input unions several repartitioned legs (q_krippendorff's three
    // raters over the spread doc scan), hit a nondeterministic AQE
    // reuse race: the units-side broadcast occasionally materialized
    // EMPTY and the inner join emitted 0 rows (~50% of runs at sf0.01,
    // local[16] — pre-existing, found while re-verifying this round).
    // The pin is bounded by the (unit, category) census, evaluates the
    // input exactly once, and makes the tail a two-aggregate join over
    // a materialized frame.
    val scored = Checkpoints.pin(
      ouc.withColumn("__m", sum(col("__o")).over(wUnit))
        .filter(col("__m") >= 2)
        .withColumn("__do",
          col("__o") * (col("__m") - col("__o")) * expr("420 div (__m - 1)")))
    val catTot = scored
      .groupBy(keys :+ col("__c"): _*)
      .agg(sum(col("__o")).as("__nc"), sum(col("__do")).as("__docat"),
        max(col("__m")).as("__mmax"))
    val units = scored.groupBy(keys: _*)
      .agg(countDistinct(col("__u")).as("n_units"))
    catTot.groupBy(keys: _*)
      .agg(sum(col("__nc")).as("n_ratings"),
        sum(col("__docat")).as("__dos"),
        sum(col("__nc").cast(dec) * col("__nc")).as("__ncsq"),
        max(col("__mmax")).as("__mmax"))
      .join(units, keyCols)
      .withColumn("__de",
        col("n_ratings").cast(dec) * col("n_ratings") - col("__ncsq"))
      .withColumn("alpha_pm",
        when(col("__mmax") > 8,
          raise_error(lit("krippendorffAlpha: more than 8 ratings in a " +
            "unit — the 420 = lcm(1..7) exact-weight envelope is stated " +
            "for m_u <= 8")).cast("long"))
          .when(col("__de") === 0, 1000L)
          .otherwise(expr(
            """CAST(1000 - (1000 * (CAST(n_ratings AS DECIMAL(38,0)) - 1) * __dos)
               div (420 * __de) AS BIGINT)""")))
      .select((keys :+ col("n_units") :+ col("n_ratings") :+ col("alpha_pm")): _*)
  }

  /** Distance covariance / correlation (Székely, Rizzo & Bakirov 2007)
    * — the dependence test that sees NONLINEAR association where the
    * Pearson/Spearman row sees zero (y = |x|, y = x² both give dCov >
    * 0; dCov = 0 ⟺ independence, the property no moment correlation
    * has). V-statistic form over a CALENDAR-BOUNDED per-key series
    * (n ≤ ~10³ points — the pair frame is n² per key, the stated
    * q_pairwise_ks bounded-spine exception): with a_ij = |x_i − x_j|,
    * double-centered Ã_ij = a_ij − ā_i· − ā_·j + ā_··, the scaled
    * integer t_a(i,j) = n²·a_ij − n·ra_i − n·ra_j + ga = n⁴·Ã_ij is
    * EXACT, and V²xy·n⁶ = Σ t_a·t_b, V²x·n⁶ = Σ t_a², V²y·n⁶ = Σ t_b²
    * are exact DECIMAL(38,0) sums. dCor⁴ = V²xy²/(V²x·V²y) (the
    * SQUARE of dCor² — squaring dodges the sqrt the no-transcendental
    * law forbids) renders by a TWO-STAGE floor ordered to stay in
    * range: q₁ = (1000·Σt_at_b) div max(Σt_a², Σt_b²) is ≤ 1000 by
    * Cauchy–Schwarz, then `dcor4_x1000` = (q₁·Σt_at_b) div
    * min(Σt_a², Σt_b²) — q₁·Σt_at_b peaks ~10³⁵, inside DECIMAL, and
    * both floors replay in HUGEINT. Constant series (V²x or V²y = 0)
    * emit 0 by convention. Envelope: per-row |t| ≤ 4·n²·max|Δ|, so
    * n ≤ 10³ with values ≤ 10¹⁰ keeps Σt² ≤ ~10³⁵ — guarded loudly on
    * n; value magnitudes are the caller's stated grid.
    */
  def distanceCovariance(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val base = df.select(keys :+ col(idCol).as("__i") :+
        col(xCol).cast("long").as("__x") :+ col(yCol).cast("long").as("__y"): _*)
      .localCheckpoint(true) // n² pair join reads both sides
    val other = base.select(keys :+ col("__i").as("__j") :+
      col("__x").as("__xj") :+ col("__y").as("__yj"): _*)
    val pairs = base.join(other, keyCols)
      .select(keys :+ col("__i") :+ col("__j") :+
        abs(col("__x") - col("__xj")).as("__a") :+
        abs(col("__y") - col("__yj")).as("__b"): _*)
      .localCheckpoint(true) // row sums and the term pass share it
    val rowS = pairs.groupBy(keys :+ col("__i"): _*)
      .agg(sum(col("__a")).as("__ra"), sum(col("__b")).as("__rb"))
      .localCheckpoint(true) // joined twice (i and j side) + grand
    val grand = rowS.groupBy(keys: _*)
      .agg(sum(col("__ra")).as("__ga"), sum(col("__rb")).as("__gb"),
        count(lit(1)).as("__n"))
      .withColumn("__n",
        when(col("__n") > 1000L, raise_error(lit(
          "distanceCovariance: series exceeds the n <= 1000 exact " +
            "envelope — coarsen the calendar grain")).cast("long"))
          .otherwise(col("__n")))
    pairs
      .join(rowS.select(keys :+ col("__i") :+ col("__ra").as("__rai") :+
        col("__rb").as("__rbi"): _*), keyCols :+ "__i")
      .join(rowS.select(keys :+ col("__i").as("__j") :+
        col("__ra").as("__raj") :+ col("__rb").as("__rbj"): _*), keyCols :+ "__j")
      .join(grand, keyCols)
      .withColumn("__ta",
        col("__n").cast(dec) * col("__n") * col("__a")
          - col("__n").cast(dec) * col("__rai")
          - col("__n").cast(dec) * col("__raj") + col("__ga"))
      .withColumn("__tb",
        col("__n").cast(dec) * col("__n") * col("__b")
          - col("__n").cast(dec) * col("__rbi")
          - col("__n").cast(dec) * col("__rbj") + col("__gb"))
      .groupBy(keys: _*)
      .agg(max(col("__n")).as("n"),
        sum(col("__ta") * col("__tb")).as("__vxy"),
        sum(col("__ta") * col("__ta")).as("__vx"),
        sum(col("__tb") * col("__tb")).as("__vy"))
      .withColumn("dcor4_x1000",
        when(col("__vx") === 0 || col("__vy") === 0, 0L)
          // negative V²xy (possible for the V-statistic on tiny n? no —
          // Σ t_a·t_b can be negative; dCov² is its positive part by
          // theory on true distance matrices, but the floored render
          // clamps at 0 to keep the emit in [0, 1000]
          .when(col("__vxy") <= 0, 0L)
          .otherwise(expr(
            """CAST(((1000 * __vxy) div greatest(__vx, __vy) * __vxy)
               div least(__vx, __vy) AS BIGINT)""")))
      .select((keys :+ col("n") :+ col("dcor4_x1000")): _*)
  }

  /** Fleiss' kappa (1971) for k BINARY raters — chance-corrected
    * agreement when [[cochranQ]] asks only whether pass RATES differ:
    * here the question is whether raters AGREE per subject beyond
    * chance. With rᵢ = raters passing subject i, S = Σrᵢ and
    * A = Σ(rᵢ² + (k−rᵢ)²) − nk, κ = (A·(nk)² − D·(S² + (nk−S)²)) /
    * (D·((nk)² − S² − (nk−S)²)) with D = nk(k−1) — every factor an
    * integer, emitted as the signed `kappa_x1000` (truncation toward
    * zero, portable per the q_kappa law). Cross-products reach ~k⁴n³,
    * so they ride DECIMAL(38,0) (exact to n ≈ 10¹⁰ at k = 3) and the
    * per-mille casts down loudly. ONE aggregate over the subject
    * frame; degenerate keys (all-pass/all-fail ⇒ denominator 0) emit
    * 0 in both engines.
    */
  def fleissKappa(
      df: DataFrame,
      keyCols: Seq[String],
      verdictCols: Seq[String]): DataFrame = {
    require(verdictCols.size >= 2, s"need >= 2 raters: $verdictCols")
    val keys = keyCols.map(col)
    val k = verdictCols.size
    val r = verdictCols.map(c => when(col(c), 1L).otherwise(0L)).reduce(_ + _)
    val dec = DecimalType(38, 0)
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_subjects"),
        sum(r).as("s_pass"),
        sum(r * r + (lit(k.toLong) - r) * (lit(k.toLong) - r)).as("__sq"))
      .withColumn("k_raters", lit(k.toLong))
      .withColumn("__nk", (col("n_subjects") * k).cast(dec))
      .withColumn("__d", (col("n_subjects") * (k.toLong * (k - 1))).cast(dec))
      .withColumn("__a", (col("__sq") - col("n_subjects") * k).cast(dec))
      .withColumn("__pe_num",
        col("s_pass").cast(dec) * col("s_pass")
          + (col("__nk") - col("s_pass")) * (col("__nk") - col("s_pass")))
      .withColumn("__den", col("__d") * (col("__nk") * col("__nk") - col("__pe_num")))
      .withColumn("kappa_x1000",
        when(col("__den") === 0, 0L).otherwise(loudLong(
          ((col("__a") * col("__nk") * col("__nk")
            - col("__d") * col("__pe_num")) * 1000
            - (col("__a") * col("__nk") * col("__nk")
              - col("__d") * col("__pe_num")) * 1000 % col("__den"))
            / col("__den"),
          "fleissKappa", "kappa_x1000")))
      .select(keys ++ Seq(col("n_subjects"), col("k_raters"), col("s_pass"),
        col("kappa_x1000")): _*)
  }

  /** Cochran–Armitage trend test (1954/1955) — is a binary outcome's
    * rate MONOTONE across ordered groups (dose levels, priority
    * classes)? With group score wᵢ, nᵢ subjects, sᵢ successes,
    * N = Σnᵢ, S = Σsᵢ: T = Σwᵢ(sᵢN − nᵢS) (signed exact — positive
    * means the rate RISES with the score) and z² = T²N /
    * (S(N−S)(N·Σwᵢ²nᵢ − (Σwᵢnᵢ)²)), emitted as `z2_x1000` with the
    * cross-products in DECIMAL(38,0) (they grow ~N⁵; exact to
    * N ≈ 10⁶·k) and loud cast-down. ONE (key, score) aggregate + one
    * bounded per-key rollup; degenerate keys (S = 0, S = N, or a
    * single score level) emit 0.
    */
  def cochranArmitage(
      df: DataFrame,
      keyCols: Seq[String],
      scoreCol: String,
      successCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val perW = df.groupBy(keys :+ col(scoreCol).as("__w"): _*)
      .agg(count(lit(1)).as("__n"),
        sum(when(col(successCol), 1L).otherwise(0L)).as("__s"))
    perW.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_levels"),
        sum(col("__n")).as("n_obs"), sum(col("__s")).as("n_pass"),
        sum(col("__w") * col("__n")).as("__wn"),
        sum(col("__w") * col("__w") * col("__n")).as("__wwn"),
        sum(col("__w").cast(dec) * col("__s")).as("__ws"),
        sum(col("__w").cast(dec) * col("__n")).as("__wn_d"))
      // T = Σw·s·N − Σw·n·S, assembled from the folded sums
      .withColumn("__t",
        col("__ws") * col("n_obs") - col("__wn_d") * col("n_pass"))
      .withColumn("t_num", loudLong(col("__t"), "cochranArmitage", "t_num"))
      .withColumn("__var",
        col("n_pass").cast(dec) * (col("n_obs") - col("n_pass"))
          * (col("__wwn").cast(dec) * col("n_obs")
            - col("__wn").cast(dec) * col("__wn")))
      .withColumn("z2_x1000",
        when(col("n_levels") < 2 || col("__var") === 0, 0L).otherwise(
          loudLong(
            (col("__t") * col("__t") * col("n_obs") * 1000
              - col("__t") * col("__t") * col("n_obs") * 1000 % col("__var"))
              / col("__var"),
            "cochranArmitage", "z2_x1000")))
      .select(keys ++ Seq(col("n_levels"), col("n_obs"), col("n_pass"),
        col("t_num"), col("z2_x1000")): _*)
  }

  /** Ordinal-association battery over a PRE-COUNTED contingency frame
    * `(keyCols..., __r, __c, __o)` with BOTH margins ordinal (integer
    * codes): concordant/discordant pair counts C and D plus the
    * same-row/same-column tie counts, folded into
    *   - Goodman–Kruskal `gamma_pm`  = 1000(C−D) div (C+D),
    *   - Somers' `somers_d_rc_pm`    = 1000(C−D) div (C+D+T_c)
    *     (ties on the COLUMN variable only — the direction predicting
    *     c from r) and `somers_d_cr_pm` symmetric,
    *   - Stuart–Kendall `tau_c_pm`   = 1000·2m(C−D) div (N²(m−1)),
    *     m = min(#rows, #cols).
    * (τ_b needs a √ and is deliberately absent — the BM25 law: never
    * emit a transcendental.) Pair counts come from a self-join of the
    * CELL table — r·c rows per key, bounded by the category space,
    * never the data — and every divide runs in DECIMAL(38,0) with
    * signed truncation toward zero (portable vs DuckDB //).
    */
  def ordinalAssocFromCounts(
      cells: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    // pin the (bounded) cell table ONCE: its three consumers — both
    // self-join legs and the margins rollup — would each re-run the
    // upstream contingency count (a full corpus scan) otherwise, the
    // cramersVFromCounts lesson
    val cellsP = cells.localCheckpoint(true)
    val a = cellsP.select(keys :+ col("__r").as("__ra") :+ col("__c").as("__ca")
      :+ col("__o").as("__oa"): _*)
    val b = cellsP.select(keys :+ col("__r").as("__rb") :+ col("__c").as("__cb")
      :+ col("__o").as("__ob"): _*)
    val pairs =
      (if (keyCols.isEmpty) a.crossJoin(b) else a.join(b, keyCols))
        .withColumn("__prod", col("__oa").cast(dec) * col("__ob"))
    val folded = pairs.groupBy(keys: _*)
      .agg(
        sum(when(col("__ra") < col("__rb") && col("__ca") < col("__cb"),
          col("__prod")).otherwise(lit(0).cast(dec))).as("__conc"),
        sum(when(col("__ra") < col("__rb") && col("__ca") > col("__cb"),
          col("__prod")).otherwise(lit(0).cast(dec))).as("__disc"),
        sum(when(col("__ra") === col("__rb") && col("__ca") < col("__cb"),
          col("__prod")).otherwise(lit(0).cast(dec))).as("__tie_r"),
        sum(when(col("__ca") === col("__cb") && col("__ra") < col("__rb"),
          col("__prod")).otherwise(lit(0).cast(dec))).as("__tie_c"),
        sum(when(col("__ra") === col("__rb") && col("__ca") === col("__cb"),
          col("__oa").cast(dec)).otherwise(lit(0).cast(dec))).as("__n"))
    def pm(num: Column, den: Column): Column =
      when(den === 0, 0L).otherwise(
        loudLong((num * 1000 - num * 1000 % den) / den, "ordinalAssoc", "pm"))
    val m = least(col("n_rows"), col("n_cols"))
    val margins = cellsP.groupBy(keys: _*)
      .agg(countDistinct(col("__r")).as("n_rows"),
        countDistinct(col("__c")).as("n_cols"))
    folded.join(margins, keyCols)
      .withColumn("c_pairs", loudLong(col("__conc"), "ordinalAssoc", "c_pairs"))
      .withColumn("d_pairs", loudLong(col("__disc"), "ordinalAssoc", "d_pairs"))
      .withColumn("n_total", loudLong(col("__n"), "ordinalAssoc", "n_total"))
      .withColumn("gamma_pm",
        pm(col("__conc") - col("__disc"), col("__conc") + col("__disc")))
      // δ_{Y|X} = (C−D)/(C+D+T_Y) with T_Y the pairs tied on the
      // DEPENDENT variable only (Somers 1962): predicting c from r
      // divides by pairs tied on c-only (__tie_c), and symmetrically
      .withColumn("somers_d_rc_pm",
        pm(col("__conc") - col("__disc"),
          col("__conc") + col("__disc") + col("__tie_c")))
      .withColumn("somers_d_cr_pm",
        pm(col("__conc") - col("__disc"),
          col("__conc") + col("__disc") + col("__tie_r")))
      .withColumn("tau_c_pm",
        when(m < 2, 0L).otherwise(
          pm((col("__conc") - col("__disc")) * 2 * m.cast(dec),
            col("__n") * col("__n") * (m - 1).cast(dec))))
      .select(keys ++ Seq(col("n_rows"), col("n_cols"), col("n_total"),
        col("c_pairs"), col("d_pairs"), col("gamma_pm"),
        col("somers_d_rc_pm"), col("somers_d_cr_pm"), col("tau_c_pm")): _*)
  }

  /** Hoover (Robin Hood) index per key — the share of total mass that
    * would have to move to equalize the distribution: H = Σ max(0,
    * n·xᵢ − T) / (n·T), the L1 member of the inequality battery next
    * to Gini (pair-based) and HHI (quadratic). EXACT: the n-scaled
    * excesses are integers, one floor at the per-mille emit. One
    * per-key window pass (n, T) + one aggregate — no sort, no pairs;
    * products ride DECIMAL(38,0) with loud cast-down.
    */
  def hoover(
      df: DataFrame,
      keyCols: Seq[String],
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val wKey = Window.partitionBy(keys: _*)
    df
      .withColumn("__n", count(lit(1)).over(wKey))
      .withColumn("__t", sum(col(vCol)).over(wKey))
      .withColumn("__ex",
        greatest(col("__n").cast(dec) * col(vCol) - col("__t"), lit(0).cast(dec)))
      .groupBy(keys: _*)
      .agg(max(col("__n")).as("n"), max(col("__t")).as("total"),
        sum(col("__ex")).as("__s"))
      .withColumn("hoover_pm",
        when(col("n") === 0 || col("total") <= 0, 0L).otherwise(
          loudLong(
            ((col("__s") * 1000 - col("__s") * 1000
              % (col("n").cast(dec) * col("total")))
              / (col("n").cast(dec) * col("total"))).cast(dec),
            "hoover", "hoover_pm")))
      .drop("__s")
  }

  /** Exact 1-D Wasserstein-1 (earth mover's) distance per key between
    * the two samples split by `inACol` — the TRANSPORT-COST member of
    * the two-sample family next to [[ksTwoSample]] (sup gap) and
    * [[cramerVonMises]] (integrated square): how much mass must move
    * how far, in the units of `vCol`. W₁ = ∫|F_a − F_b| dv collapses
    * on the shared value spine to Σ_rows |n_b·C_a − n_a·C_b|·Δv with
    * Δv the gap to the next spine value (the last row's gap vanishes
    * since both CDFs reach 1), one truncating ÷(n_a·n_b) at the emit:
    * every intermediate an exact DECIMAL(38,0) integer. Same
    * one-aggregate + per-key-window cost as KS — the group sizes fold
    * off the spine's own partition window, so there is no totals join
    * at all.
    */
  def wasserstein1(
      df: DataFrame,
      keyCols: Seq[String],
      inACol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val pv = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(sum(when(col(inACol), 1L).otherwise(0L)).as("__a"),
        sum(when(col(inACol), 0L).otherwise(1L)).as("__b"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    val wLead = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
    pv
      .withColumn("__ca", sum(col("__a")).over(wCum))
      .withColumn("__cb", sum(col("__b")).over(wCum))
      .withColumn("n_a", sum(col("__a")).over(wAll))
      .withColumn("n_b", sum(col("__b")).over(wAll))
      .withColumn("__dv", lead(col("__v"), 1).over(wLead) - col("__v"))
      // the LAST spine row (null Δv) contributes zero — kept, not
      // filtered, so a key whose spine is a single value still emits
      // its W1 = 0 row (property-tested)
      .withColumn("__t",
        when(col("__dv").isNotNull,
          abs(col("n_b").cast(dec) * col("__ca")
            - col("n_a").cast(dec) * col("__cb")) * col("__dv"))
          .otherwise(lit(0L).cast(dec)))
      .groupBy(keys: _*)
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(col("__t")).as("__num"))
      .withColumn("w1_x1000",
        when(col("n_a") === 0 || col("n_b") === 0, 0L)
          .otherwise(expr(
            "(__num * 1000) div (CAST(n_a AS DECIMAL(38,0)) * n_b)")))
      .drop("__num")
  }

  /** Two-sample energy distance (Székely & Rizzo 2004) per key:
    * D² = 2E|X−Y| − E|X−X'| − E|Y−Y'| — nonzero iff the two
    * distributions differ AT ALL (location, scale, shape), the
    * characteristic-function-complete member of the family
    * [[ksTwoSample]] / [[cramerVonMises]] / [[wasserstein1]] sample
    * from. The O(n²) pairwise |x−y| sums collapse on the sorted value
    * spine to strictly-below prefix count/sum windows — Σ_pairs |v−w|
    * = Σ_rows m·(c_below·v − s_below) within a sample, and the
    * mirrored below/above split for the cross term — three exact
    * DECIMAL(38,0) sums from ONE spine, zero pairs materialized. The
    * floored per-mille components (eab/eaa/ebb) ride as witnesses;
    * `d2_x1000` composes from the EXACT common-denominator numerator,
    * one division at the emit.
    */
  def energyDistance(
      df: DataFrame,
      keyCols: Seq[String],
      inACol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val pv = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(sum(when(col(inACol), 1L).otherwise(0L)).as("__a"),
        sum(when(col(inACol), 0L).otherwise(1L)).as("__b"))
    val wBelow = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(keys: _*)
    pv
      .withColumn("__cal", coalesce(sum(col("__a")).over(wBelow), lit(0L)))
      .withColumn("__sal",
        coalesce(sum(col("__a").cast(dec) * col("__v")).over(wBelow),
          lit(0L).cast(dec)))
      .withColumn("__cbl", coalesce(sum(col("__b")).over(wBelow), lit(0L)))
      .withColumn("__sbl",
        coalesce(sum(col("__b").cast(dec) * col("__v")).over(wBelow),
          lit(0L).cast(dec)))
      .withColumn("n_a", sum(col("__a")).over(wAll))
      .withColumn("n_b", sum(col("__b")).over(wAll))
      .withColumn("__sbt", sum(col("__b").cast(dec) * col("__v")).over(wAll))
      .withColumn("__cbg", col("n_b") - col("__cbl") - col("__b"))
      .withColumn("__sbg",
        col("__sbt") - col("__sbl") - col("__b").cast(dec) * col("__v"))
      .withColumn("__tab",
        col("__a").cast(dec)
          * (col("__cbl").cast(dec) * col("__v") - col("__sbl")
             + col("__sbg") - col("__cbg").cast(dec) * col("__v")))
      .withColumn("__taa",
        col("__a").cast(dec)
          * (col("__cal").cast(dec) * col("__v") - col("__sal")))
      .withColumn("__tbb",
        col("__b").cast(dec)
          * (col("__cbl").cast(dec) * col("__v") - col("__sbl")))
      .groupBy(keys: _*)
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(col("__tab")).as("sab"), sum(col("__taa")).as("saa"),
        sum(col("__tbb")).as("sbb"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("eab_pm",
        expr("(2000 * sab) div (CAST(n_a AS DECIMAL(38,0)) * n_b)"))
      .withColumn("eaa_pm",
        expr("(2000 * saa) div (CAST(n_a AS DECIMAL(38,0)) * n_a)"))
      .withColumn("ebb_pm",
        expr("(2000 * sbb) div (CAST(n_b AS DECIMAL(38,0)) * n_b)"))
      .withColumn("d2_x1000", expr(
        """(2000 * (sab * n_a * n_b - saa * n_b * n_b - sbb * n_a * n_a))
           div (CAST(n_a AS DECIMAL(38,0)) * n_a * n_b * n_b)"""))
      .drop("sab", "saa", "sbb")
  }

  /** Pairwise total-variation (and L∞) distance matrix between the
    * CATEGORICAL distributions of every group pair — the corpus-mix
    * drift audit (which sources' language/topic mixes disagree, and by
    * how much): TV(p, q) = ½Σ_c |p_c − q_c| ∈ [0, 1], cross-multiplied
    * exactly as Σ|m1·N2 − m2·N1| over the BOUNDED category set.
    * `tv_pm` floors once per pair; `linf_pm` (the single worst
    * category gap) rides along. Never a row pair join: one (group,
    * cat) aggregate, densified over |groups|·|cats| cells, pair join
    * bounded by |groups|²·|cats|.
    */
  def pairwiseTotalVariation(
      df: DataFrame,
      groupCol: String,
      catCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val counts = df.groupBy(col(groupCol).as("__g"), col(catCol).as("__c"))
      .agg(count(lit(1)).as("__m"))
      .localCheckpoint(true)
    val groups = counts.select(col("__g")).distinct()
    val cats = counts.select(col("__c")).distinct()
    val dense = groups.crossJoin(cats)
      .join(counts, Seq("__g", "__c"), "left")
      .na.fill(0L, Seq("__m"))
      .withColumn("__ng", sum(col("__m")).over(Window.partitionBy(col("__g"))))
      .localCheckpoint(true) // both sides of the bounded pair join
    val a = dense.select(col("__g").as("g1"), col("__c"),
      col("__m").as("__m1"), col("__ng").as("n1"))
    val b = dense.select(col("__g").as("g2"), col("__c"),
      col("__m").as("__m2"), col("__ng").as("n2"))
    a.join(b, Seq("__c"))
      .filter(col("g1") < col("g2"))
      .withColumn("__gap",
        abs(col("__m1").cast(dec) * col("n2") - col("__m2").cast(dec) * col("n1")))
      .groupBy(col("g1"), col("g2"))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(col("__gap")).as("__l1"), max(col("__gap")).as("__linf"))
      .withColumn("tv_pm",
        when(col("n1") === 0 || col("n2") === 0, 0L).otherwise(
          loudLong(
            ((col("__l1") * 1000 - col("__l1") * 1000
              % (col("n1").cast(dec) * col("n2") * 2))
              / (col("n1").cast(dec) * col("n2") * 2)).cast(dec),
            "pairwiseTotalVariation", "tv_pm")))
      .withColumn("linf_pm",
        when(col("n1") === 0 || col("n2") === 0, 0L).otherwise(
          loudLong(
            ((col("__linf") * 1000 - col("__linf") * 1000
              % (col("n1").cast(dec) * col("n2")))
              / (col("n1").cast(dec) * col("n2"))).cast(dec),
            "pairwiseTotalVariation", "linf_pm")))
      .drop("__l1", "__linf")
  }

  /** Exact ROC AUC of an integer score against a binary label —
    * the Mann–Whitney identity AUC = (#\{s⁺ > s⁻\} + ½#ties)/(n⁺n⁻),
    * rendered as `auc_x1000` = (1000·(2·p_gt + ties)) div (2·n⁺·n⁻):
    * the ranking-quality number every learned quality filter is tuned
    * by, with no threshold choice and no floats. The [[cliffsDelta]]
    * value spine exactly (per-score counts + one cumulative window per
    * key — never a pair join); products ride DECIMAL(38,0), loud
    * cast-down. Degenerate keys (single-class) render 0.
    */
  def auc(
      df: DataFrame,
      keyCols: Seq[String],
      labelCol: String,
      scoreCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val perV = df.groupBy(keys :+ col(scoreCol).as("__v"): _*)
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("__n"))
    val wLt = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wKey = Window.partitionBy(keys: _*)
    perV
      .withColumn("__nlt", coalesce(sum(col("__n")).over(wLt), lit(0L)))
      .withColumn("__npos", sum(col("__p")).over(wKey))
      .withColumn("__nneg", sum(col("__n")).over(wKey))
      .groupBy(keys: _*)
      .agg(max(col("__npos")).as("n_pos"), max(col("__nneg")).as("n_neg"),
        sum(col("__p").cast(dec) * col("__nlt")).as("__pgt"),
        sum(col("__p").cast(dec) * col("__n")).as("__t"))
      .withColumn("auc_x1000",
        when(col("n_pos") === 0 || col("n_neg") === 0, 0L).otherwise(
          loudLong(
            (((col("__pgt") * 2 + col("__t")) * 1000
              - (col("__pgt") * 2 + col("__t")) * 1000
                % (col("n_pos").cast(dec) * col("n_neg") * 2))
              / (col("n_pos").cast(dec) * col("n_neg") * 2)).cast(dec),
            "auc", "auc_x1000")))
      .drop("__pgt", "__t")
  }

  /** Goodman–Kruskal lambda (1954) — proportional reduction in error
    * predicting `colCol` from `rowCol`: λ = (Σ_r max_c n_rc − max_c
    * n_·c) / (N − max_c n_·c), EXACT rationals of pure counts (the
    * categorical-association member with no χ², no products — just
    * maxima), 0 when the modal column already explains everything
    * (denominator 0 = nothing to reduce). Emitted per direction
    * (`lambda_rc_pm` rows→cols, `lambda_cr_pm` cols→rows) plus the
    * grand N. One (row, col) cell aggregate + bounded-margin rollups —
    * cells are |rows|·|cols|, a category product, never data.
    */
  def gkLambda(
      df: DataFrame,
      rowCol: String,
      colCol: String): DataFrame = {
    val cells = df.groupBy(col(rowCol).as("__r"), col(colCol).as("__c"))
      .agg(count(lit(1)).as("__m"))
      .localCheckpoint(true) // margins, maxima, and N all fold off it
    val sumRowMax = cells.groupBy(col("__r")).agg(max(col("__m")).as("__mx"))
      .agg(sum(col("__mx")).as("__srm"))
    val sumColMax = cells.groupBy(col("__c")).agg(max(col("__m")).as("__mx"))
      .agg(sum(col("__mx")).as("__scm"))
    val colMarginMax = cells.groupBy(col("__c")).agg(sum(col("__m")).as("__n"))
      .agg(max(col("__n")).as("__mc"))
    val rowMarginMax = cells.groupBy(col("__r")).agg(sum(col("__m")).as("__n"))
      .agg(max(col("__n")).as("__mr"))
    val n = cells.agg(sum(col("__m")).as("n_total"))
    n.crossJoin(broadcast(sumRowMax)).crossJoin(broadcast(sumColMax))
      .crossJoin(broadcast(colMarginMax)).crossJoin(broadcast(rowMarginMax))
      .withColumn("lambda_rc_pm",
        when(col("n_total") === col("__mc"), 0L)
          .otherwise(expr("(1000 * (__srm - __mc)) div (n_total - __mc)")))
      .withColumn("lambda_cr_pm",
        when(col("n_total") === col("__mr"), 0L)
          .otherwise(expr("(1000 * (__scm - __mr)) div (n_total - __mr)")))
      .select(col("n_total"), col("lambda_rc_pm"), col("lambda_cr_pm"))
  }

  /** Youden's J and signed MCC² over a binary 2×2 — the INFORMEDNESS
    * and correlation renderings completing the paired-verdict battery
    * next to [[mcnemar]] (marginal change) and [[oddsRatio]]
    * (association): J = tpr + tnr − 1 = Δ/((n₁₁+n₁₀)(n₀₀+n₀₁)) and
    * MCC² = Δ²/(four-margin product), both with Δ = n₁₁n₀₀ − n₁₀n₀₁ —
    * exact cross-multiplied integers, `mcc2_x1e6` carrying Δ's sign
    * (the square loses it; a negative value means anti-correlated
    * verdicts). Degenerate margins (a constant verdict) render 0.
    * Same ONE aggregate as the siblings; Δ² and the margin product
    * ride DECIMAL(38,0) with loud cast-down.
    */
  def youdenJ(
      df: DataFrame,
      keyCols: Seq[String],
      aCol: String,
      bCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val delta = col("n11").cast(dec) * col("n00") - col("n10").cast(dec) * col("n01")
    val mA = (col("n11") + col("n10")).cast(dec)
    val mNa = (col("n00") + col("n01")).cast(dec)
    val mB = (col("n11") + col("n01")).cast(dec)
    val mNb = (col("n00") + col("n10")).cast(dec)
    mcnemar(df, keyCols, aCol, bCol)
      .withColumn("j_pm",
        when(col("n11") + col("n10") === 0 || col("n00") + col("n01") === 0, 0L)
          .otherwise(loudLong(
            ((delta * 1000 - delta * 1000 % (mA * mNa)) / (mA * mNa)).cast(dec),
            "youdenJ", "j_pm")))
      .withColumn("mcc2_x1e6",
        when(mA === 0 || mNa === 0 || mB === 0 || mNb === 0, 0L)
          .otherwise(loudLong(
            // integer sign, NOT signum (whose double return would
            // contaminate the exact decimal product)
            (when(delta < 0, lit(-1)).otherwise(lit(1)).cast(dec) *
              ((delta * delta * 1000000
                - delta * delta * 1000000 % (mA * mNa * mB * mNb))
                / (mA * mNa * mB * mNb))).cast(dec),
            "youdenJ", "mcc2_x1e6")))
      .drop("chi2_x1000")
  }

  /** Odds ratio over the same paired-verdict 2×2 as [[mcnemar]] —
    * the ASSOCIATION companion to McNemar's marginal-change test:
    * OR = (n₁₁·n₀₀)/(n₁₀·n₀₁), emitted as `or_x1000` by exact floor
    * division in DECIMAL(38,0) (cell products leave BIGINT at ~3·10⁹
    * rows per key); any empty discordant/concordant cell makes the
    * ratio undefined → 0, the portable "no signal" rendering. Rides
    * the mcnemar aggregate — one pass, both statistics.
    */
  def oddsRatio(
      df: DataFrame,
      keyCols: Seq[String],
      aCol: String,
      bCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    mcnemar(df, keyCols, aCol, bCol)
      .withColumn("or_x1000",
        when(col("n10") === 0 || col("n01") === 0 ||
          col("n11") === 0 || col("n00") === 0, 0L)
          .otherwise(loudLong(
            ((col("n11").cast(dec) * col("n00") * 1000
              - col("n11").cast(dec) * col("n00") * 1000
                % (col("n10").cast(dec) * col("n01")))
              / (col("n10").cast(dec) * col("n01"))).cast(dec),
            "oddsRatio", "or_x1000")))
  }

  /** Durbin–Watson statistic (1950) on MEAN-DETRENDED integer series —
    * the raw-value von Neumann ratio companion to [[bartels]]' rank
    * rendering: DW = Σ(e_t − e_{t−1})² / Σe_t² over residuals from the
    * per-key mean, ≈2 under independence, →0 under positive lag-1
    * autocorrelation, →4 under alternation. EXACT: residuals scale by
    * n (e_t = n·x_t − Σx — integers, the n² cancels in the ratio), the
    * two quadratic sums ride DECIMAL(38,0), and `dw_x1000` floors
    * once. Mean detrending only (the lag-1 diagnostic), stated rather
    * than hidden: against a TRENDING series DW reads the trend as
    * positive autocorrelation — run it on differenced or
    * regression-residual inputs when that matters. One lag window over
    * the per-key ORDERED spine + one aggregate.
    */
  def durbinWatson(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val wKey = Window.partitionBy(keys: _*)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col(orderCol).asc)
    val res = df
      .withColumn("__n", count(lit(1)).over(wKey))
      .withColumn("__s", sum(col(vCol)).over(wKey))
      .withColumn("__e", (col("__n").cast(dec) * col(vCol) - col("__s")))
      .withColumn("__ep", lag(col("__e"), 1).over(wOrd))
    res.groupBy(keys: _*)
      .agg(max(col("__n")).as("n"),
        sum(col("__e") * col("__e")).as("__den"),
        sum(when(col("__ep").isNotNull,
          (col("__e") - col("__ep")) * (col("__e") - col("__ep")))
          .otherwise(lit(0).cast(dec))).as("__num"))
      .withColumn("dw_x1000",
        when(col("n") < 2 || col("__den") === 0, 0L).otherwise(
          loudLong(
            ((col("__num") * 1000 - col("__num") * 1000 % col("__den"))
              / col("__den")).cast(dec),
            "durbinWatson", "dw_x1000")))
      .drop("__den", "__num")
  }

  /** Sign test (Arbuthnott 1710; the oldest nonparametric test) over
    * paired integer observations: count positive / negative / zero
    * differences per key — under H₀ the positives are
    * Binomial(n_pos+n_neg, ½), so `b_stat` = min(n_pos, n_neg) is the
    * exact-binomial tail statistic and `sign_stat` = n_pos − n_neg the
    * direction. Magnitude-free (only signs enter), which is what makes
    * it the assumption-light sibling of [[wilcoxonSignedRank]]; both
    * read the SAME paired frame, completing the paired battery next to
    * the unpaired Mann–Whitney. ONE aggregate — no window, no join:
    * the cheapest test in the family at any scale.
    */
  def signTest(
      pairs: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val d = col(xCol) - col(yCol)
    pairs
      .groupBy(keys: _*)
      .agg(sum(when(d > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(when(d < 0, 1L).otherwise(0L)).as("n_neg"),
        sum(when(d === 0, 1L).otherwise(0L)).as("n_zero"))
      .withColumn("sign_stat", col("n_pos") - col("n_neg"))
      .withColumn("b_stat", least(col("n_pos"), col("n_neg")))
  }

  /** Ansari–Bradley two-sample SCALE test (1960) — do A and B share a
    * center but differ in dispersion? Pooled ranks score
    * s(i) = min(i, N+1−i): extremes score low, the center high, so a
    * WIDER sample collects less score. Statistic = Σ_A scores with
    * midscores over tie runs.
    *
    * Exact rendering on the [[ksTwoSample]] value spine: a tie run
    * occupies ranks [a, b] (from the cumulative window), and the run's
    * DOUBLED score sum Σ 2·min(i, N+1−i) is a closed-form pair of
    * arithmetic series split at the peak c = (N+1) div 2 — no
    * enumeration. The run's A-mass takes its proportional share, and
    * because the share's denominator is the RUN length (not a global
    * constant), the emitted `ab2_x1000` is the FLOOR-COMPOSED rendering:
    * per-run (1000·m_A·S2_run) div L, then summed — both engines replay
    * the same floors (the cramersV per-cell discipline; deviation from
    * the real rational < #runs/1000 per mille). `e_ab2_x1000` rides
    * along: 2000·E[AB] = 1000·n₁(N+2)/2 for even N, 1000·n₁(N+1)²/(2N)
    * for odd (floor-divided) — the centering an audit compares against.
    * Products ~N³ ride DECIMAL(38,0) with loud cast-down.
    */
  def ansariBradley(
      df: DataFrame,
      keyCols: Seq[String],
      inACol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val perV = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(sum(when(col(inACol), 1L).otherwise(0L)).as("__a"),
        sum(when(col(inACol), 0L).otherwise(1L)).as("__b"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wKey = Window.partitionBy(keys: _*)
    // arithmetic-series sum (lo+hi)(hi−lo+1) of 2i over [lo, hi], 0 when empty
    def ser2(lo: Column, hi: Column): Column =
      when(hi < lo, lit(0L).cast(dec))
        .otherwise((lo + hi).cast(dec) * (hi - lo + 1))
    perV
      .withColumn("__m", col("__a") + col("__b"))
      .withColumn("__hi", sum(col("__m")).over(wCum))
      .withColumn("__lo", col("__hi") - col("__m") + 1)
      .withColumn("__n", sum(col("__m")).over(wKey))
      // peak of min(i, N+1−i): ranks ≤ c score 2i doubled; above score
      // 2(N+1−i) = series of 2j over the REFLECTED range j = N+1−i
      .withColumn("__c", expr("(__n + 1) div 2"))
      .withColumn("__s2run",
        ser2(col("__lo"), least(col("__hi"), col("__c"))) +
          ser2(col("__n") + 1 - col("__hi"),
            least(col("__n") - col("__c"), col("__n") + 1 - col("__lo"))))
      .withColumn("__contrib",
        (col("__s2run") * col("__a") * 1000
          - col("__s2run") * col("__a") * 1000 % col("__m").cast(dec))
          / col("__m").cast(dec))
      .groupBy(keys: _*)
      .agg(sum(col("__a")).as("n1"), sum(col("__b")).as("n2"),
        sum(col("__contrib").cast(dec)).as("__ab2"))
      .withColumn("n_total", col("n1") + col("n2"))
      .withColumn("ab2_x1000", loudLong(col("__ab2"), "ansariBradley", "ab2_x1000"))
      .withColumn("e_ab2_x1000",
        when(col("n1") === 0 || col("n2") === 0, 0L)
          .when(pmod(col("n_total"), lit(2L)) === 0,
            expr("(1000 * n1 * (n_total + 2)) div 2"))
          .otherwise(expr(
            "(1000 * n1 * (n_total + 1) * (n_total + 1)) div (2 * n_total)")))
      .drop("__ab2")
  }

  /** Lepage joint location–scale two-sample test: the sum of the squared
    * standardized Wilcoxon rank-sum (location) and Ansari–Bradley
    * (scale) statistics, χ²₂ under the null — the omnibus that fires
    * when EITHER the center or the spread moved, completing the
    * two-sample battery (mannwhitney = location only, ansariBradley =
    * scale only, ks/cvm = shape). One value spine carries both margins.
    *
    * Exactness ledger, column by column:
    *   - `w2` = Σ_A doubled midranks (lo+hi per tie run) — integer
    *     EXACT; `e_w2` = n1·(N+1) exact; the tie-corrected variance
    *     var(W2) = n1·n2·((N+1)·N·(N−1) − Σ(m³−m)) / (3·N·(N−1)) floors
    *     ONCE into `__vw2` (value ~n1·n2·N/3: DECIMAL(38,0) holds it to
    *     sf100 with 10+ digits of headroom), then
    *     `z2w_x1e6` = ((w2−e_w2)²·10⁶) div __vw2 floors once more — the
    *     two-stage rendering keeps every product under ~1e34 where the
    *     single-division form would cross 1e38 at 100×.
    *   - the AB side rides the [[ansariBradley]] ×1000 grid: `ab2_x1000`
    *     / `e_ab2_x1000` are that operator's stated renderings; the
    *     midrank score-square total Σ_runs S2run²/m floors per run at
    *     ×1000 (`__t2`), the variance numerator re-scales to the unit
    *     grid (`__q2` = (N·__t2 − 1000·S2tot²) div 1000, ~8e24 at
    *     sf100), `__vab2` = (n1·n2·__q2) div (N²·(N−1)), and
    *     `z2ab_x1e6` = (ab2 dev on the ×1000 grid)² div __vab2 — the
    *     ×1000² deviation over the unit-grid variance IS the ×10⁶
    *     standardized square, no further scaling.
    *   - `lepage_x1e6` = z2w_x1e6 + z2ab_x1e6.
    * Degenerate keys (one-arm, N<2, or all-tied: variance 0) emit 0 for
    * the affected component by stated convention — never a divide error.
    * Shape: one per-(key,value) aggregate, one per-key cumulative
    * window over the value spine, one final aggregate — the
    * [[ansariBradley]] cost class exactly.
    */
  def lepage(
      df: DataFrame,
      keyCols: Seq[String],
      inACol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val perV = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(sum(when(col(inACol), 1L).otherwise(0L)).as("__a"),
        sum(when(col(inACol), 0L).otherwise(1L)).as("__b"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wKey = Window.partitionBy(keys: _*)
    def ser2(lo: Column, hi: Column): Column =
      when(hi < lo, lit(0L).cast(dec))
        .otherwise((lo + hi).cast(dec) * (hi - lo + 1))
    val spine = perV
      .withColumn("__m", col("__a") + col("__b"))
      .withColumn("__hi", sum(col("__m")).over(wCum))
      .withColumn("__lo", col("__hi") - col("__m") + 1)
      .withColumn("__n", sum(col("__m")).over(wKey))
      .withColumn("__c", expr("(__n + 1) div 2"))
      // doubled AB scores summed over this tie run (the ansariBradley
      // piecewise-peak identity), and their per-run midrank square
      .withColumn("__s2run",
        ser2(col("__lo"), least(col("__hi"), col("__c"))) +
          ser2(col("__n") + 1 - col("__hi"),
            least(col("__n") - col("__c"), col("__n") + 1 - col("__lo"))))
      .withColumn("__abrun",
        (col("__s2run") * col("__a") * 1000
          - col("__s2run") * col("__a") * 1000 % col("__m").cast(dec))
          / col("__m").cast(dec))
      .withColumn("__t2run",
        (col("__s2run") * col("__s2run") * 1000
          - col("__s2run") * col("__s2run") * 1000 % col("__m").cast(dec))
          / col("__m").cast(dec))
    spine
      .groupBy(keys: _*)
      .agg(sum(col("__a")).as("n1"), sum(col("__b")).as("n2"),
        sum(col("__a").cast(dec) * (col("__lo") + col("__hi"))).as("__w2"),
        sum(col("__m").cast(dec) * col("__m") * col("__m") - col("__m"))
          .as("__ties"),
        sum(col("__abrun").cast(dec)).as("__ab2"),
        sum(col("__t2run").cast(dec)).as("__t2"),
        sum(col("__s2run")).as("__s2tot"))
      .withColumn("nn", col("n1") + col("n2"))
      .withColumn("w2", loudLong(col("__w2"), "lepage", "w2"))
      .withColumn("e_w2", col("n1") * (col("nn") + 1L))
      .withColumn("__vw2", when(col("nn") < 2, lit(null).cast("long"))
        .otherwise(expr(
          """(CAST(n1 AS DECIMAL(38,0)) * n2
             * ((nn + 1) * CAST(nn AS DECIMAL(38,0)) * (nn - 1) - __ties))
             div (3 * CAST(nn AS DECIMAL(38,0)) * (nn - 1))""")))
      .withColumn("z2w_x1e6",
        when(col("n1") === 0 || col("n2") === 0 || col("nn") < 2 ||
          col("__vw2").isNull || col("__vw2") <= 0, 0L)
          .otherwise(expr(
            """((w2 - e_w2) * CAST((w2 - e_w2) AS DECIMAL(38,0)) * 1000000)
               div __vw2""")))
      .withColumn("ab2_x1000", loudLong(col("__ab2"), "lepage", "ab2_x1000"))
      .withColumn("e_ab2_x1000",
        when(col("n1") === 0 || col("n2") === 0, 0L)
          .when(pmod(col("nn"), lit(2L)) === 0,
            expr("(1000 * n1 * (nn + 2)) div 2"))
          .otherwise(expr("(1000 * n1 * (nn + 1) * (nn + 1)) div (2 * nn)")))
      .withColumn("__q2", expr(
        "(CAST(nn AS DECIMAL(38,0)) * __t2 - 1000 * __s2tot * __s2tot) div 1000"))
      .withColumn("__vab2", when(col("nn") < 2, lit(null).cast("long"))
        .otherwise(expr(
          """(CAST(n1 AS DECIMAL(38,0)) * n2 * __q2)
             div (CAST(nn AS DECIMAL(38,0)) * nn * (nn - 1))""")))
      .withColumn("z2ab_x1e6",
        when(col("n1") === 0 || col("n2") === 0 ||
          col("__vab2").isNull || col("__vab2") <= 0, 0L)
          .otherwise(expr(
            """((ab2_x1000 - e_ab2_x1000)
               * CAST((ab2_x1000 - e_ab2_x1000) AS DECIMAL(38,0)))
               div __vab2""")))
      .withColumn("lepage_x1e6", col("z2w_x1e6") + col("z2ab_x1e6"))
      .select((keys :+ col("n1") :+ col("n2") :+ col("w2") :+ col("e_w2") :+
        col("ab2_x1000") :+ col("e_ab2_x1000") :+ col("z2w_x1e6") :+
        col("z2ab_x1e6") :+ col("lepage_x1e6")): _*)
  }

  /** Exact sample L-moments (Hosking 1990) per key: the robust
    * distributional-shape battery — L-scale, L-CV, L-skewness (t3),
    * L-kurtosis (t4) — computed as EXACT integers with no order
    * statistics ever materialized per row. The probability-weighted
    * moments b_r = (1/n)·Σᵢ [(i−1)⋯(i−r)]/[(n−1)⋯(n−r)]·x₍ᵢ₎ need the
    * rank-weighted sums Σ(i−1)⋯(i−r)·x₍ᵢ₎; over a TIE RUN occupying
    * ranks [lo,hi] these falling-factorial weights have closed-form
    * prefix polynomials (Σ_{j≤k}(j−1) = (k−1)k/2, Σ(j−1)(j−2) =
    * (k−2)(k−1)k/3, Σ(j−1)(j−2)(j−3) = (k−3)(k−2)(k−1)k/4 — each a
    * product of consecutive integers, so the division is exact and the
    * k<r cases vanish through the zero factor), so everything folds
    * off the VALUE SPINE: one per-(key,value) aggregate, one per-key
    * cumulative window, one final aggregate — the [[ansariBradley]]
    * shape, full parallelism at any scale, and tie handling is
    * definitionally consistent (tied values share their rank mass
    * rather than an arbitrary tiebreak).
    *
    * The run sums stay UNDIVIDED (T_r = r!·S_r) so nothing routes
    * through a Long-typed integral divide mid-computation; all λ
    * numerators then ride the common denominator 12·D with integer
    * coefficients (D = n(n−1)(n−2)(n−3)):
    * L1n = 12·S0·(n−1)(n−2)(n−3), L2n = 12·T1·(n−2)(n−3) − L1n,
    * L3n = 24·T2·(n−3) − 36·T1·(n−2)(n−3) + L1n,
    * L4n = 60·T3 − 120·T2·(n−3) + 72·T1·(n−2)(n−3) − L1n.
    * Emitted: location/scale floored once by D, and the three
    * scale-free ratios (L-CV = λ2/λ1, t3 = λ3/λ2, t4 = λ4/λ2) as
    * single ×1000 floored cross-multiplications. Callers pass values
    * on a grid keeping n⁴·x under ~10³⁴ (kilodollars at TPC-H shapes —
    * the q_variance_ratio discipline); keys with n < 4 emit zeros by
    * stated convention (λ4 needs four distinct ranks).
    */
  def lMoments(
      df: DataFrame,
      keyCols: Seq[String],
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val perV = df.groupBy(keys :+ col(vCol).as("__v"): _*)
      .agg(count(lit(1)).as("__m"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wKey = Window.partitionBy(keys: _*)
    // prefix polynomials at hi minus at lo−1, kept UNDIVIDED (T_r =
    // r!-scaled falling-factorial sums) so no intermediate ever passes
    // through a Long-typed integral divide; the 2/3/4 denominators
    // fold into the λ-numerator coefficients over 12·D
    perV
      .withColumn("__hi", sum(col("__m")).over(wCum))
      .withColumn("__lo", col("__hi") - col("__m") + 1)
      .withColumn("__t1", expr(
        """((__hi - 1) * CAST(__hi AS DECIMAL(38,0)))
           - ((__lo - 2) * CAST(__lo - 1 AS DECIMAL(38,0)))"""))
      .withColumn("__t2", expr(
        """((__hi - 2) * (__hi - 1) * CAST(__hi AS DECIMAL(38,0)))
           - ((__lo - 3) * (__lo - 2) * CAST(__lo - 1 AS DECIMAL(38,0)))"""))
      .withColumn("__t3", expr(
        """((__hi - 3) * (__hi - 2) * (__hi - 1)
            * CAST(__hi AS DECIMAL(38,0)))
           - ((__lo - 4) * (__lo - 3) * (__lo - 2)
            * CAST(__lo - 1 AS DECIMAL(38,0)))"""))
      .groupBy(keys: _*)
      .agg(sum(col("__m")).as("n"),
        sum(col("__m").cast(dec) * col("__v")).as("__b0"),
        sum(col("__t1") * col("__v")).as("__t1"),
        sum(col("__t2") * col("__v")).as("__t2"),
        sum(col("__t3") * col("__v")).as("__t3"))
      .withColumn("__a0", expr(
        "12 * __b0 * (n - 1) * (n - 2) * (n - 3)"))
      .withColumn("__l1n", col("__a0"))
      .withColumn("__l2n", expr(
        "12 * __t1 * (n - 2) * (n - 3) - __a0"))
      .withColumn("__l3n", expr(
        "24 * __t2 * (n - 3) - 36 * __t1 * (n - 2) * (n - 3) + __a0"))
      .withColumn("__l4n", expr(
        """60 * __t3 - 120 * __t2 * (n - 3)
           + 72 * __t1 * (n - 2) * (n - 3) - __a0"""))
      .withColumn("__d", expr(
        "12 * CAST(n AS DECIMAL(38,0)) * (n - 1) * (n - 2) * (n - 3)"))
      .withColumn("l1", when(col("n") < 4, 0L)
        .otherwise(expr("__l1n div __d")))
      .withColumn("l2", when(col("n") < 4, 0L)
        .otherwise(expr("__l2n div __d")))
      .withColumn("lcv_x1000", when(col("n") < 4 || col("__l1n") <= 0, 0L)
        .otherwise(expr("(1000 * __l2n) div __l1n")))
      .withColumn("t3_x1000", when(col("n") < 4 || col("__l2n") <= 0, 0L)
        .otherwise(expr("(1000 * __l3n) div __l2n")))
      .withColumn("t4_x1000", when(col("n") < 4 || col("__l2n") <= 0, 0L)
        .otherwise(expr("(1000 * __l4n) div __l2n")))
      .select((keys :+ col("n") :+ col("l1") :+ col("l2") :+
        col("lcv_x1000") :+ col("t3_x1000") :+ col("t4_x1000")): _*)
  }

  /** Pairwise Mann–Whitney census over ALL unordered group pairs — the
    * post-hoc companion to [[kruskalWallis]]: which groups actually
    * differ once the omnibus test fires? Per (key, g1 < g2): the exact
    * pair counts p_gt/p_lt/ties, the DOUBLED U statistic
    * `u2_g1` = 2·#\{a>b\} + #ties (integral with midrank ties), and the
    * rank-biserial effect size `r_rb_pm` = 1000·(p_gt − p_lt) div
    * (n1·n2) — Cliff's δ per pair, truncation toward zero matching
    * DuckDB // (the q_kappa discipline).
    *
    * Scale shape: NEVER a pair join over rows. One per-(value, group)
    * aggregate; the value spine DENSIFIED over the bounded group set
    * (|V|·k rows — k is a category count, not data) carries each
    * group's cumulative mass via one window; pair counts then fold in
    * a spine×group join bounded by |V|·k². Pair-count products ride
    * DECIMAL(38,0) with loud cast-down past BIGINT.
    */
  def pairwiseMannWhitney(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val perVG = df.groupBy(keys :+ col(vCol).as("__v") :+ col(groupCol).as("__g"): _*)
      .agg(count(lit(1)).as("__m"))
      .localCheckpoint(true) // feeds the spine, the densify, and the A side
    val spine = perVG.select(keys :+ col("__v"): _*).distinct()
    val groups = perVG.select(keys :+ col("__g"): _*).distinct()
    val dense = spine.join(groups, keyCols)
      .join(perVG, keyCols ++ Seq("__v", "__g"), "left")
      .na.fill(0L, Seq("__m"))
    val wCumB = Window.partitionBy(keys :+ col("__g"): _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wG = Window.partitionBy(keys :+ col("__g"): _*)
    val cum = dense
      .withColumn("__below", coalesce(sum(col("__m")).over(wCumB), lit(0L)))
      .withColumn("__ng", sum(col("__m")).over(wG))
      .select(keys ++ Seq(col("__v"), col("__g").as("__g2"),
        col("__m").as("__m2"), col("__below"), col("__ng").as("__n2")): _*)
    perVG.join(cum, keyCols :+ "__v")
      .filter(col("__g") < col("__g2"))
      .groupBy(keys ++ Seq(col("__g").as("g1"), col("__g2").as("g2")): _*)
      .agg(max(col("__n2")).as("n2"), sum(col("__m")).as("n1"),
        sum(col("__m").cast(dec) * col("__below")).as("__pgt"),
        sum(col("__m").cast(dec) * (col("__n2") - col("__below") - col("__m2")))
          .as("__plt"),
        sum(col("__m").cast(dec) * col("__m2")).as("__t"))
      .withColumn("p_gt", loudLong(col("__pgt"), "pairwiseMannWhitney", "p_gt"))
      .withColumn("p_lt", loudLong(col("__plt"), "pairwiseMannWhitney", "p_lt"))
      .withColumn("u2_g1", loudLong(col("__pgt") * 2 + col("__t"),
        "pairwiseMannWhitney", "u2_g1"))
      .withColumn("r_rb_pm",
        when(col("n1") === 0 || col("n2") === 0, 0L).otherwise(
          loudLong(
            ((col("__pgt") - col("__plt")) * 1000
              - ((col("__pgt") - col("__plt")) * 1000
                % (col("n1").cast(dec) * col("n2"))))
              / (col("n1").cast(dec) * col("n2")),
            "pairwiseMannWhitney", "r_rb_pm")))
      .drop("__pgt", "__plt", "__t")
  }

  /** Pairwise Kolmogorov–Smirnov distance matrix over ALL unordered
    * group pairs — [[pairwiseMannWhitney]]'s shape applied to
    * [[ksTwoSample]]'s statistic: per (key, g1 < g2) the exact sup-gap
    * numerator D = max|cum₁·n₂ − cum₂·n₁| and `d_pm` = (1000·D) div
    * (n₁·n₂). The drift MATRIX a multi-source corpus audit reads
    * (which sources disagree, not just whether one pair does).
    *
    * Same scale shape as the pairwise MW: one per-(value, group)
    * aggregate, the spine densified over the bounded group set, one
    * cumulative window per (key, group), and a spine×group join
    * bounded by |V|·k². Cross products ride DECIMAL(38,0), loud
    * cast-down.
    */
  def pairwiseKs(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val perVG = df.groupBy(keys :+ col(vCol).as("__v") :+ col(groupCol).as("__g"): _*)
      .agg(count(lit(1)).as("__m"))
      .localCheckpoint(true)
    val spine = perVG.select(keys :+ col("__v"): _*).distinct()
    val groups = perVG.select(keys :+ col("__g"): _*).distinct()
    val dense = spine.join(groups, keyCols)
      .join(perVG, keyCols ++ Seq("__v", "__g"), "left")
      .na.fill(0L, Seq("__m"))
    val wCum = Window.partitionBy(keys :+ col("__g"): _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wG = Window.partitionBy(keys :+ col("__g"): _*)
    val cum = dense
      .withColumn("__cum", sum(col("__m")).over(wCum))
      .withColumn("__ng", sum(col("__m")).over(wG))
      .localCheckpoint(true) // both sides of the pair join read it
    val a = cum.select(keys ++ Seq(col("__v"), col("__g").as("g1"),
      col("__cum").as("__c1"), col("__ng").as("n1")): _*)
    val b = cum.select(keys ++ Seq(col("__v"), col("__g").as("g2"),
      col("__cum").as("__c2"), col("__ng").as("n2")): _*)
    a.join(b, keyCols :+ "__v")
      .filter(col("g1") < col("g2"))
      .groupBy(keys ++ Seq(col("g1"), col("g2")): _*)
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("__c1").cast(dec) * col("n2") - col("__c2").cast(dec) * col("n1")))
          .as("__d"))
      .withColumn("d_num", loudLong(col("__d"), "pairwiseKs", "d_num"))
      .withColumn("d_pm",
        when(col("n1") === 0 || col("n2") === 0, 0L).otherwise(
          loudLong(
            ((col("__d") * 1000 - col("__d") * 1000
              % (col("n1").cast(dec) * col("n2")))
              / (col("n1").cast(dec) * col("n2"))).cast(dec),
            "pairwiseKs", "d_pm")))
      .drop("__d")
  }

  /** Lo–MacKinlay variance-ratio test (1988) on an integer series —
    * is a daily aggregate a random walk (VR ≈ 1), mean-reverting
    * (VR < 1), or trending (VR > 1)? With population-variance
    * numerators V(d) = n·Σd² − (Σd)² over 1-step and q-step
    * differences of the per-key series (consecutive spine positions;
    * the q-step pool is the n−q overlapping windows), the emitted
    * `vr_x1000` = (1000·V_q·n₁²) div (q·V₁·n_q²) — every factor an
    * exact integer in DECIMAL(38,0), one floor at the end, loud
    * cast-down. Diffs come from `lag` over the per-key ORDERED spine
    * (calendar-bounded — the day-spine exception); cents² terms reach
    * ~10²¹ at 10⁹-cent days, far inside DECIMAL.
    */
  def varianceRatio(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      vCol: String,
      q: Int): DataFrame = {
    require(q >= 2, s"variance-ratio lag must be >= 2: $q")
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col(orderCol).asc)
    val diffs = df
      .withColumn("__d1", col(vCol) - lag(col(vCol), 1).over(wOrd))
      .withColumn("__dq", col(vCol) - lag(col(vCol), q).over(wOrd))
    def vnum(d: Column, n: Column, s: Column, ss: Column): Column =
      n.cast(dec) * ss - s.cast(dec) * s
    val agg = diffs.groupBy(keys: _*)
      .agg(count(col("__d1")).as("n1"),
        sum(col("__d1").cast(dec)).as("__s1"),
        sum(col("__d1").cast(dec) * col("__d1")).as("__ss1"),
        count(col("__dq")).as("nq"),
        sum(col("__dq").cast(dec)).as("__sq"),
        sum(col("__dq").cast(dec) * col("__dq")).as("__ssq"))
    agg
      .withColumn("__v1", vnum(col("__d1"), col("n1"), col("__s1"), col("__ss1")))
      .withColumn("__vq", vnum(col("__dq"), col("nq"), col("__sq"), col("__ssq")))
      .withColumn("vr_x1000",
        when(col("n1") < 2 || col("nq") < 2 || col("__v1") === 0, 0L).otherwise(
          loudLong(
            ((col("__vq") * col("n1") * col("n1") * 1000
              - col("__vq") * col("n1") * col("n1") * 1000
                % (col("__v1") * q * col("nq") * col("nq")))
              / (col("__v1") * q * col("nq") * col("nq"))).cast(dec),
            "varianceRatio", "vr_x1000")))
      .select(keys ++ Seq(col("n1"), col("nq"),
        loudLong(col("__v1"), "varianceRatio", "v1_num").as("v1_num"),
        loudLong(col("__vq"), "varianceRatio", "vq_num").as("vq_num"),
        col("vr_x1000")): _*)
  }

  /** Wilson-score lower-bound ranking (Wilson 1927; the "how not to
    * sort by average rating" order) at z = 2 (~95%): small samples
    * with perfect rates sort BELOW large samples with merely good
    * rates — the uncertainty-honest leaderboard for pass rates. The
    * bound itself is the fixed double tree
    * (p̂ + 2/n − 2·√(p̂(1−p̂)/n + 1/n²)) / (1 + 4/n) — √ is correctly
    * rounded by IEEE in both engines (the partialCorrelation law) so
    * the rank replays bitwise — and `gt_half` ("the bound clears
    * 50%") is decided EXACTLY with no floats at all via the squared
    * form n·(2·pos−n)² > 16·(pos·(n−pos)+n) on the 2·pos > n branch.
    * One aggregate + one bounded rank window.
    */
  def wilsonRank(
      df: DataFrame,
      keyCol: String,
      passCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val g = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(passCol), 1L).otherwise(0L)).as("pos"))
    val nd = col("n").cast("double")
    val ph = col("pos").cast("double") / nd
    val term = (ph * (lit(1.0) - ph)) / nd + lit(1.0) / (nd * nd)
    val lb = (ph + lit(2.0) / nd - lit(2.0) * sqrt(term)) /
      (lit(1.0) + lit(4.0) / nd)
    g.withColumn("rate_pm", expr("(1000 * pos) div n"))
      .withColumn("wilson_lb", lb)
      .withColumn("gt_half",
        col("pos") * 2 > col("n") &&
          col("n").cast(dec) * (col("pos").cast(dec) * 2 - col("n"))
            * (col("pos").cast(dec) * 2 - col("n")) >
          (col("pos").cast(dec) * (col("n") - col("pos")) + col("n")) * 16)
      .withColumn("final_rank",
        row_number().over(
          Window.orderBy(col("wilson_lb").desc, col(keyCol).asc)).cast("long"))
  }

  /** Rand index and Adjusted Rand (Hubert & Arabie 1985) between two
    * categorical PARTITIONS of the same rows — "do these two labelings
    * cut the corpus the same way", the pair-counting agreement that
    * needs no label alignment (unlike accuracy) and no logs (unlike
    * NMI). All four pair censuses are DOUBLED integers (x(x−1), no /2
    * materializes) off one contingency aggregate + bounded margin
    * rollups: RI_pm = (1000·(2T_c + T_n − T_a − T_b)) div T_n and
    * ARI×10⁶ = (10⁶·2·(T_c·T_n − T_a·T_b)) div ((T_a+T_b)·T_n −
    * 2·T_a·T_b), signed truncation toward zero. T·T ~ N⁴ caps the
    * exact envelope at N ≈ 10⁸ rows (loud past it); a single-cluster
    * degenerate pair (denominator 0) emits ARI 0.
    */
  def randIndex(
      df: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__m"))
      .localCheckpoint(true) // margins and N all fold off it
    def t2(c: Column): Column = (c.cast(dec) * (c - 1))
    val tc = cells.agg(sum(t2(col("__m"))).as("__tc"))
    val ta = cells.groupBy(col("__a")).agg(sum(col("__m")).as("__n"))
      .agg(count(lit(1)).as("k_a"), sum(t2(col("__n"))).as("__ta"))
    val tb = cells.groupBy(col("__b")).agg(sum(col("__m")).as("__n"))
      .agg(count(lit(1)).as("k_b"), sum(t2(col("__n"))).as("__tb"))
    val n = cells.agg(sum(col("__m")).as("n_rows"))
    n.crossJoin(broadcast(tc)).crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .withColumn("__tn", t2(col("n_rows")))
      .withColumn("ri_pm",
        when(col("__tn") === 0, 1000L).otherwise(loudLong(
          (((col("__tc") * 2 + col("__tn") - col("__ta") - col("__tb")) * 1000
            - (col("__tc") * 2 + col("__tn") - col("__ta") - col("__tb")) * 1000
              % col("__tn")) / col("__tn")).cast(dec),
          "randIndex", "ri_pm")))
      .withColumn("__den",
        (col("__ta") + col("__tb")) * col("__tn") - col("__ta") * col("__tb") * 2)
      .withColumn("ari_x1e6",
        when(col("__den") === 0, 0L).otherwise(loudLong(
          (((col("__tc") * col("__tn") - col("__ta") * col("__tb")) * 2000000
            - (col("__tc") * col("__tn") - col("__ta") * col("__tb")) * 2000000
              % col("__den")) / col("__den")).cast(dec),
          "randIndex", "ari_x1e6")))
      .select(col("n_rows"), col("k_a"), col("k_b"),
        loudLong(col("__tc"), "randIndex", "t_cells_x2").as("t_cells_x2"),
        col("ri_pm"), col("ari_x1e6"))
  }

  /** Isotonic regression of a binned reliability curve — PAV rendered
    * by its MINIMAX identity ŷ_k = max_{i≤k} min_{j≥k} mean(y[i..j])
    * (Ayer et al. 1955), which turns the sequential pool-adjacent-
    * violators loop into three BOUNDED joins over the ≤B-bin frame —
    * the calibration-FIXING step after q_calibration measures the
    * miscalibration, exactly as production probability calibrators
    * run it. Range means are exact integer rationals off prefix sums;
    * the arg-min/arg-max are picked by the deterministic
    * (mean-as-double, index) order — the same correctly-rounded
    * double in both engines, so the pick (and with it the emitted
    * exact floor `iso_pm`) replays bitwise. The fitted curve is
    * non-decreasing in the bin order by construction. B²·B triples
    * per key — bins, never data.
    */
  def isotonicBinned(
      binned: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      nCol: String,
      posCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val wCum = Window.partitionBy(keys: _*).orderBy(col(ordCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sp = binned
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keys: _*).orderBy(col(ordCol).asc)).cast("long"))
      .withColumn("__cp", sum(col(posCol)).over(wCum))
      .withColumn("__cn", sum(col(nCol)).over(wCum))
    val asI = sp.select(keys ++ Seq(col("__rn").as("__i"),
      (col("__cp") - col(posCol)).as("__cpi"),
      (col("__cn") - col(nCol)).as("__cni")): _*)
    val asJ = sp.select(keys ++ Seq(col("__rn").as("__j"),
      col("__cp").as("__cpj"), col("__cn").as("__cnj")): _*)
    val ranges = asI.join(asJ, keyCols).filter(col("__i") <= col("__j"))
      .withColumn("__num", col("__cpj") - col("__cpi"))
      .withColumn("__den", col("__cnj") - col("__cni"))
      .withColumn("__mean", col("__num").cast("double") / col("__den").cast("double"))
    val triples = sp.select(keys ++ Seq(col(ordCol), col("__rn"),
        col(nCol), col(posCol)): _*)
      .join(ranges, keyCols)
      .filter(col("__i") <= col("__rn") && col("__rn") <= col("__j"))
    val wInner = Window.partitionBy(keys ++ Seq(col("__rn"), col("__i")): _*)
      .orderBy(col("__mean").asc, col("__j").asc)
    val inner = triples.withColumn("__r1", row_number().over(wInner))
      .filter(col("__r1") === 1)
    val wOuter = Window.partitionBy(keys :+ col("__rn"): _*)
      .orderBy(col("__mean").desc, col("__i").asc)
    inner.withColumn("__r2", row_number().over(wOuter))
      .filter(col("__r2") === 1)
      .withColumn("rate_pm", expr(s"(1000 * $posCol) div $nCol"))
      .withColumn("iso_pm", expr("(1000 * __num) div __den"))
      .select(keys ++ Seq(col(ordCol), col(nCol), col(posCol),
        col("rate_pm"), col("iso_pm")): _*)
  }

  /** Mantel–Haenszel pooled odds ratio (1959) over stratified 2×2
    * tables — the confounding-proof association [[oddsRatio]]'s crude
    * 2×2 cannot give (Simpson's reversal is exactly the crude/MH
    * disagreement, so BOTH are emitted): OR_MH = Σᵢaᵢdᵢ/nᵢ / Σᵢbᵢcᵢ/nᵢ
    * with each stratum term FLOORED AT ×10⁶ (term = (10⁶·aᵢdᵢ) div nᵢ)
    * so the sums stay exact integers — commutative, shuffle-order-
    * free — and the final ratio is one truncating division; no double
    * ever materializes. Floor error ≤ k_strata on the 10⁶ scale
    * (documented). One stratum aggregate + one global fold; cell
    * products ride DECIMAL(38,0), loud cast-down. Empty MH denominator
    * (no discordant mass anywhere) emits 0.
    */
  def mantelHaenszel(
      df: DataFrame,
      strataCol: String,
      expCol: String,
      outCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = df.groupBy(col(strataCol).as("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(expCol) && col(outCol), 1L).otherwise(0L)).as("__a"),
        sum(when(col(expCol) && !col(outCol), 1L).otherwise(0L)).as("__b"),
        sum(when(!col(expCol) && col(outCol), 1L).otherwise(0L)).as("__c"),
        sum(when(!col(expCol) && !col(outCol), 1L).otherwise(0L)).as("__d"))
      .withColumn("__tnum", expr(
        "(CAST(__a AS DECIMAL(38,0)) * __d * 1000000) div __n"))
      .withColumn("__tden", expr(
        "(CAST(__b AS DECIMAL(38,0)) * __c * 1000000) div __n"))
    cells.agg(count(lit(1)).as("k_strata"),
        sum(col("__n")).as("n_total"),
        sum(col("__a")).as("a"), sum(col("__b")).as("b"),
        sum(col("__c")).as("c"), sum(col("__d")).as("d"),
        sum(col("__tnum").cast(dec)).as("__num"),
        sum(col("__tden").cast(dec)).as("__den"))
      .withColumn("mh_num_x1e6", loudLong(col("__num"), "mantelHaenszel", "mh_num"))
      .withColumn("mh_den_x1e6", loudLong(col("__den"), "mantelHaenszel", "mh_den"))
      .withColumn("or_mh_x1000",
        when(col("__den") === 0, 0L).otherwise(loudLong(
          ((col("__num") * 1000 - col("__num") * 1000 % col("__den"))
            / col("__den")).cast(dec),
          "mantelHaenszel", "or_mh_x1000")))
      .withColumn("or_crude_x1000",
        when(col("b") === 0 || col("c") === 0, 0L).otherwise(loudLong(
          ((col("a").cast(dec) * col("d") * 1000
            - col("a").cast(dec) * col("d") * 1000
              % (col("b").cast(dec) * col("c")))
            / (col("b").cast(dec) * col("c"))).cast(dec),
          "mantelHaenszel", "or_crude_x1000")))
      .drop("__num", "__den")
  }

  /** Brown–Forsythe test (1974) — the ROBUST homoscedasticity screen
    * next to [[hartleyFmax]]'s extreme ratio: a one-way ANOVA on the
    * absolute deviations from each GROUP MEDIAN, so one heavy tail
    * can't masquerade as unequal variance (Levene's mean-based
    * original can). Medians are exact doubled integers (lower+upper
    * median, the no-.5 rendering: z = |2v − med2|) read off the
    * (group, value) count spine by one cumulative window — never a
    * sort-collect — and the F pieces reuse the q_anova integer
    * computational form: SSB·n = Σ_g (n·T_g − n_g·T)² div (n_g·n),
    * SST·n = n·ΣΣz² − T², all DECIMAL(38,0). Emitted: the n-divided
    * BIGINT SS witnesses, degrees of freedom, and `f_x1000` by one
    * truncating cross-multiplied division (0 when SSW = 0 — a
    * degenerate all-equal-deviation key).
    */
  def brownForsythe(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val perV = df.groupBy(keys ++ Seq(col(groupCol).as("__g"), col(vCol).as("__v")): _*)
      .agg(count(lit(1)).as("__m"))
    val wCum = Window.partitionBy(keys :+ col("__g"): _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wG = Window.partitionBy(keys :+ col("__g"): _*)
    val spine = perV
      .withColumn("__cum", sum(col("__m")).over(wCum))
      .withColumn("__ng", sum(col("__m")).over(wG))
      .withColumn("__lo", expr("(__ng + 1) div 2"))
      .withColumn("__up", expr("__ng div 2 + 1"))
    val meds = spine.groupBy(keys :+ col("__g"): _*)
      .agg(
        sum(when(col("__cum") - col("__m") < col("__lo") && col("__cum") >= col("__lo"),
          col("__v")).otherwise(0L)).as("__mlo"),
        sum(when(col("__cum") - col("__m") < col("__up") && col("__cum") >= col("__up"),
          col("__v")).otherwise(0L)).as("__mup"))
      .withColumn("__med2", col("__mlo") + col("__mup"))
      .select(keys ++ Seq(col("__g"), col("__med2")): _*)
    val z = perV.join(meds, keyCols :+ "__g")
      .withColumn("__z", abs(col("__v") * 2 - col("__med2")).cast(dec))
    val g = z.groupBy(keys :+ col("__g"): _*)
      .agg(sum(col("__m")).as("__ng"),
        sum(col("__m").cast(dec) * col("__z")).as("__tg"),
        sum(col("__m").cast(dec) * col("__z") * col("__z")).as("__sqg"))
    val tot = g.groupBy(keys: _*)
      .agg(sum(col("__ng")).as("__n"), sum(col("__tg")).as("__t"),
        sum(col("__sqg")).as("__sq"), count(lit(1)).as("k_groups"))
    g.join(tot, keyCols)
      .withColumn("__dev2",
        ((col("__n").cast(dec) * col("__tg") - col("__ng").cast(dec) * col("__t"))
          * (col("__n").cast(dec) * col("__tg") - col("__ng").cast(dec) * col("__t"))
          - (col("__n").cast(dec) * col("__tg") - col("__ng").cast(dec) * col("__t"))
            * (col("__n").cast(dec) * col("__tg") - col("__ng").cast(dec) * col("__t"))
            % (col("__ng").cast(dec) * col("__n")))
          / (col("__ng").cast(dec) * col("__n")))
      .groupBy(keys ++ Seq(col("__n"), col("__t"), col("__sq"), col("k_groups")): _*)
      .agg(sum(col("__dev2").cast(dec)).as("__ssb"))
      .withColumn("__sst", col("__n").cast(dec) * col("__sq") - col("__t") * col("__t"))
      .withColumn("__ssw", col("__sst") - col("__ssb"))
      .withColumn("df_b", col("k_groups") - 1)
      .withColumn("df_w", col("__n") - col("k_groups"))
      .withColumn("f_x1000",
        when(col("df_b") === 0 || col("df_w") <= 0 || col("__ssw") <= 0, 0L)
          .otherwise(loudLong(
            ((col("__ssb") * col("df_w") * 1000
              - col("__ssb") * col("df_w") * 1000
                % (col("__ssw") * col("df_b")))
              / (col("__ssw") * col("df_b"))).cast(dec),
            "brownForsythe", "f_x1000")))
      .select(keys ++ Seq(col("__n").as("n_obs"), col("k_groups"),
        loudLong(expr("__ssb div CAST(__n AS DECIMAL(38,0))"), "brownForsythe", "ssb")
          .as("ssb"),
        loudLong(expr("__ssw div CAST(__n AS DECIMAL(38,0))"), "brownForsythe", "ssw")
          .as("ssw"),
        col("df_b"), col("df_w"), col("f_x1000")): _*)
  }

  /** Hartley's Fmax (1950) — the homoscedasticity screen run before
    * trusting [[anova]]-style pooled variances: the ratio of the
    * LARGEST group variance to the SMALLEST within each key, exact by
    * cross-multiplication of the integer variance rationals
    * vnum_g/vden_g (vnum = n·Σx²−(Σx)² in DECIMAL(38,0), vden =
    * n(n−1)): fmax_x1000 = (1000·vnum_max·vden_min) div
    * (vnum_min·vden_max). Groups with n < 2 carry no variance and are
    * excluded; a zero minimum variance (a constant group) emits 0,
    * the portable "unbounded" rendering. Which group is max/min is
    * decided by the deterministic (variance-as-double, group) order —
    * one IEEE division per group, identical in both engines — and the
    * RATIO then runs exact. One group aggregate + two rank windows
    * over the bounded group frame.
    */
  def hartleyFmax(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      vCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val g = df.groupBy(keys :+ col(groupCol).as("__g"): _*)
      .agg(count(lit(1)).as("__n"),
        sum(col(vCol).cast(dec)).as("__s"),
        sum(col(vCol).cast(dec) * col(vCol)).as("__ss"))
      .filter(col("__n") >= 2)
      .withColumn("__vnum", col("__n").cast(dec) * col("__ss") - col("__s") * col("__s"))
      .withColumn("__vden", (col("__n") * (col("__n") - 1)).cast(dec))
      .withColumn("__v", col("__vnum").cast("double") / col("__vden").cast("double"))
    val wMax = Window.partitionBy(keys: _*)
      .orderBy(col("__v").desc, col("__g").asc)
    val wMin = Window.partitionBy(keys: _*)
      .orderBy(col("__v").asc, col("__g").asc)
    g.withColumn("__rmax", row_number().over(wMax))
      .withColumn("__rmin", row_number().over(wMin))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_groups"),
        max(when(col("__rmax") === 1, col("__g"))).as("g_max"),
        max(when(col("__rmin") === 1, col("__g"))).as("g_min"),
        max(when(col("__rmax") === 1, col("__vnum"))).as("__nmax"),
        max(when(col("__rmax") === 1, col("__vden"))).as("__dmax"),
        max(when(col("__rmin") === 1, col("__vnum"))).as("__nmin"),
        max(when(col("__rmin") === 1, col("__vden"))).as("__dmin"))
      .withColumn("fmax_x1000",
        when(col("n_groups") < 2 || col("__nmin") === 0, 0L).otherwise(
          loudLong(
            ((col("__nmax") * col("__dmin") * 1000
              - col("__nmax") * col("__dmin") * 1000
                % (col("__nmin") * col("__dmax")))
              / (col("__nmin") * col("__dmax"))).cast(dec),
            "hartleyFmax", "fmax_x1000")))
      .drop("__nmax", "__dmax", "__nmin", "__dmin")
  }

  /** Palma and 20:20 share ratios — the tail-vs-tail inequality
    * numbers [[hoover]]'s one-number L1 and q_gini's rank form don't
    * localize: top-decile mass over bottom-40% mass (Palma 2011) and
    * top-quintile over bottom-quintile. Rank cuts run on the
    * DETERMINISTIC total order (value, id) — `idCol` breaks value
    * ties identically in both engines, so "bottom 40%" is the same
    * row set everywhere — with bottom-k = ranks ≤ (n·k) div 10 and
    * top-k = ranks > (n·(10−k)) div 10 (complementary floors: the
    * two cuts never overlap, middle mass absorbs the remainder).
    * Sums ride DECIMAL(38,0); ratios per-mille by one truncating
    * division, 0 when the bottom mass is 0 (the portable "undefined"
    * rendering). One row_number window + one aggregate.
    */
  def palmaRatios(
      df: DataFrame,
      keyCols: Seq[String],
      vCol: String,
      idCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val dec = DecimalType(38, 0)
    val wOrd = Window.partitionBy(keys: _*)
      .orderBy(col(vCol).asc, col(idCol).asc)
    val wKey = Window.partitionBy(keys: _*)
    def ratio(top: Column, bot: Column, what: String): Column =
      when(bot === 0, 0L).otherwise(loudLong(
        ((top * 1000 - top * 1000 % bot) / bot).cast(dec),
        "palmaRatios", what))
    df.withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(wKey))
      .groupBy(keys: _*)
      .agg(max(col("__n")).as("n"),
        sum(when(col("__rn") <= expr("(__n * 4) div 10"),
          col(vCol).cast(dec)).otherwise(lit(0).cast(dec))).as("__b40"),
        sum(when(col("__rn") > expr("(__n * 9) div 10"),
          col(vCol).cast(dec)).otherwise(lit(0).cast(dec))).as("__t10"),
        sum(when(col("__rn") <= expr("(__n * 2) div 10"),
          col(vCol).cast(dec)).otherwise(lit(0).cast(dec))).as("__b20"),
        sum(when(col("__rn") > expr("(__n * 8) div 10"),
          col(vCol).cast(dec)).otherwise(lit(0).cast(dec))).as("__t20"))
      .select(keys ++ Seq(col("n"),
        loudLong(col("__b40"), "palmaRatios", "bottom40").as("bottom40"),
        loudLong(col("__t10"), "palmaRatios", "top10").as("top10"),
        loudLong(col("__b20"), "palmaRatios", "bottom20").as("bottom20"),
        loudLong(col("__t20"), "palmaRatios", "top20").as("top20"),
        ratio(col("__t10"), col("__b40"), "palma_x1000").as("palma_x1000"),
        ratio(col("__t20"), col("__b20"), "s2020_x1000").as("s2020_x1000")): _*)
  }

  /** Bowley quantile skewness (1901) and Moors octile kurtosis (1988)
    * — the distribution-SHAPE diagnostics that need no moments (and so
    * no overflow-prone fourth powers): B = (E6+E2−2E4)/(E6−E2),
    * M = ((E7−E5)+(E3−E1))/(E6−E2) over octiles E_i = value at rank
    * ⌈n·i/8⌉ of the DETERMINISTIC total order (value, id) — the
    * type-1 quantile, exact in both engines with no interpolation
    * arithmetic. Per-mille by one truncating division each; a
    * degenerate IQR (E6 = E2) emits 0. Octiles fold from ONE
    * row_number window + one conditional-max aggregate (never a sort
    * collect); reference M ≈ 1233 for a normal distribution.
    */
  def quantileShape(
      df: DataFrame,
      keyCols: Seq[String],
      vCol: String,
      idCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val wOrd = Window.partitionBy(keys: _*)
      .orderBy(col(vCol).asc, col(idCol).asc)
    val wKey = Window.partitionBy(keys: _*)
    val base = df
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(wKey))
    val octs = (1 to 7).map(i =>
      max(when(col("__rn") === expr(s"(__n * $i + 7) div 8"), col(vCol))).as(s"e$i"))
    val aggs = max(col("__n")).as("n") +: octs
    base.groupBy(keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bowley_x1000",
        when(col("e6") === col("e2"), 0L).otherwise(
          expr("(1000 * (e6 + e2 - 2 * e4)) div (e6 - e2)")))
      .withColumn("moors_x1000",
        when(col("e6") === col("e2"), 0L).otherwise(
          expr("(1000 * ((e7 - e5) + (e3 - e1))) div (e6 - e2)")))
  }

  /** Krippendorff's nominal α (2004) and Gwet's AC1 (2008) for m
    * CATEGORICAL raters per unit — the multi-category completion of
    * [[fleissKappa]]'s binary frame (kappa asks "do binary verdicts
    * coincide beyond chance"; these grade an m-rater CLASS assignment,
    * and AC1 stays stable where κ/α collapse under prevalence skew).
    * With s_u = Σ_c n_uc² per unit (= m + 2·agreeing unordered pairs),
    * n = m·N total labels and n_c the per-category label totals:
    *
    *   α   = 1 − Do/De,  Do = Σ_u(m²−s_u) / ((m−1)·n),
    *                     De = (n²−Σn_c²) / (n(n−1))
    *   AC1 = (po−pe)/(1−pe),  po = Σ_u(s_u−m) / (m(m−1)N),
    *                          pe = (n²−Σn_c²) / ((K−1)·n²)
    *
    * — every factor an exact integer count, both statistics emitted
    * per-mille by ONE cross-multiplied truncating division each
    * (toward zero, the q_kappa law; α and AC1 can be negative).
    * K = categories observed in the key (the scheme as realized; a
    * single-category key has po = 1, pe undefined → both emit 1000).
    * Cross-products ride DECIMAL(38,0): P·S ~ m²(m−1)KN³ caps the
    * exact envelope at N ≈ 10¹⁰ units per key for m = 3, loud past
    * it. s_u folds from the m(m−1)/2 pairwise column equalities (no
    * per-unit explode); n_c takes the ONE explode of the m label
    * columns — two aggregates total over the unit frame.
    */
  def multiRaterAgreement(
      df: DataFrame,
      keyCols: Seq[String],
      raterCols: Seq[String]): DataFrame = {
    require(raterCols.size >= 2, s"need >= 2 raters: $raterCols")
    val keys = keyCols.map(col)
    val m = raterCols.size
    val dec = DecimalType(38, 0)
    // agreeing unordered pairs per unit: Σ_{i<j} [r_i = r_j]
    val agreePairs = raterCols.combinations(2).map { case Seq(a, b) =>
      when(col(a) === col(b), 1L).otherwise(0L)
    }.reduce(_ + _)
    val perKey = df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_units"),
        // P = Σ_u(s_u − m) = 2·Σ agree pairs; A = Σ_u(m² − s_u)
        sum(agreePairs * 2).as("__p"),
        sum(lit(m.toLong * m - m) - agreePairs * 2).as("__a"))
    val labels = df.select(keys :+ explode(array(raterCols.map(col): _*))
      .as("__lab"): _*)
    val cats = labels.groupBy(keys :+ col("__lab"): _*)
      .agg(count(lit(1)).as("__nc"))
      .groupBy(keys: _*)
      .agg(countDistinct(col("__lab")).as("k_cats"),
        sum(col("__nc").cast(dec) * col("__nc")).as("__sc2"))
    perKey.join(cats, keyCols)
      .withColumn("__n", (col("n_units") * m).cast(dec))
      .withColumn("__r", col("__n") * col("__n") - col("__sc2"))
      // α = 1 − A(n−1) / ((m−1)(n²−Σn_c²))
      .withColumn("alpha_x1000",
        when(col("k_cats") === 1, 1000L).otherwise(loudLong(
          (lit(1000).cast(dec) -
            (col("__a").cast(dec) * (col("__n") - 1) * 1000
              - col("__a").cast(dec) * (col("__n") - 1) * 1000
                % (col("__r") * (m - 1)))
              / (col("__r") * (m - 1))).cast(dec),
          "multiRaterAgreement", "alpha_x1000")))
      // AC1 = (P·S − R·Q) / (Q·(S − R)), Q = m(m−1)N, S = (K−1)n²
      .withColumn("__q", (col("n_units") * (m.toLong * (m - 1))).cast(dec))
      .withColumn("__s", (col("k_cats") - 1).cast(dec) * col("__n") * col("__n"))
      .withColumn("ac1_x1000",
        when(col("k_cats") === 1, 1000L).otherwise(loudLong(
          (((col("__p").cast(dec) * col("__s") - col("__r") * col("__q")) * 1000
            - (col("__p").cast(dec) * col("__s") - col("__r") * col("__q")) * 1000
              % (col("__q") * (col("__s") - col("__r"))))
            / (col("__q") * (col("__s") - col("__r")))).cast(dec),
          "multiRaterAgreement", "ac1_x1000")))
      .select(keys ++ Seq(col("n_units"), col("k_cats"),
        loudLong(col("__p"), "multiRaterAgreement", "agree_pairs_x2")
          .as("agree_pairs_x2"),
        col("alpha_x1000"), col("ac1_x1000")): _*)
  }
}
