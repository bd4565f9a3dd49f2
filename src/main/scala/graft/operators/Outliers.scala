package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier statistics — median / MAD (median absolute
  * deviation) with a Hampel-style cutoff `|x − med| > c·MAD`. The robust
  * scale estimate is the standard pre-training data-quality screen where
  * mean/stddev would be dragged by the very outliers being hunted.
  *
  * Determinism is a design constraint here, not an accident: median and
  * MAD are SELECTIONS (order statistics), not summations, so there is no
  * floating-point accumulation order to drift between engines or between
  * cluster runs. Both median legs materialize row_number/count windows and
  * average the (at most two) middle values — every arithmetic step is a
  * single exact-rounded FP op, so a DuckDB oracle reproduces the output
  * bit-for-bit. (A mean/stddev z-score can flip membership on an ulp; this
  * cannot.)
  *
  * Scale shape: two window passes (shuffle on the group keys) + two
  * aggregated per-group tables joined back (one row per group — AQE
  * broadcasts them). Group count is the only driver-independent small
  * dimension; rows never collect.
  */
object Outliers {

  /** Per-group robust stats: (groupCols..., n, med, mad, n_outliers) with
    * outliers defined as |value − med| > c·MAD.
    */
  def madOutlierStats(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      c: Double = 3.0): DataFrame = {
    val keys = groupCols.map(col)
    val base = df
      .select((groupCols :+ idCol :+ valueCol).map(col): _*)
      .filter(col(valueCol).isNotNull)

    // Median as an explicit order statistic: rows at 1-indexed positions
    // (n+1) div 2 and (n+2) div 2 (identical for odd n), averaged.
    def medianOf(in: DataFrame, vc: String, outName: String): DataFrame = {
      val wOrd = Window.partitionBy(keys: _*).orderBy(col(vc).asc, col(idCol).asc)
      val wAll = Window.partitionBy(keys: _*)
      in.withColumn("__rn", row_number().over(wOrd))
        .withColumn("__n", count(lit(1)).over(wAll))
        .filter(col("__rn") === expr("(__n + 1) DIV 2") ||
          col("__rn") === expr("(__n + 2) DIV 2"))
        .groupBy(keys: _*)
        .agg(avg(col(vc)).as(outName))
    }

    // Null-safe key equality (<=>): a null-keyed group — the rows a
    // data-quality screen most needs to see — must join back to its own
    // median/MAD row instead of silently vanishing through `=` semantics.
    def joinOnKeys(l: DataFrame, r: DataFrame): DataFrame = {
      // alias both sides: r derives from l, so bare column refs would be
      // ambiguous against the shared lineage
      val cond = groupCols.map(c => col(s"__l.$c") <=> col(s"__r.$c")).reduce(_ && _)
      l.alias("__l").join(r.alias("__r"), cond).select(
        (groupCols.map(c => col(s"__l.$c").as(c)) ++
          l.columns.filterNot(groupCols.contains).map(c => col(s"__l.$c")) ++
          r.columns.filterNot(groupCols.contains).map(c => col(s"__r.$c"))): _*)
    }

    val med = medianOf(base, valueCol, "med")
    val dev = joinOnKeys(base, med)
      .withColumn("__adev", abs(col(valueCol) - col("med")))
    val mad = medianOf(dev, "__adev", "mad")
    joinOnKeys(dev, mad)
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        sum(when(col("__adev") > lit(c) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Per-group winsorization: clamp each value into
    * [v(ceil(n/den)), v(n+1−ceil(n/den))] of its group's order statistics
    * (den=10 → the classic 10%/90% tails). Same determinism argument as
    * [[madOutlierStats]]: the clamp bounds are SELECTED values and the
    * clamp itself is min/max — no arithmetic at all, so any engine
    * reproduces the output exactly. One window shuffle on the group keys.
    * Adds `<valueCol>_w`; null values pass through unclamped.
    */
  def winsorize(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      den: Int = 10): DataFrame = {
    require(den >= 2, s"den must be >= 2, got $den")
    val keys = groupCols.map(col)
    val wAll = Window.partitionBy(keys: _*)
    df.withColumn("__rn",
        when(col(valueCol).isNotNull, row_number().over(
          Window.partitionBy(keys: _*)
            .orderBy(col(valueCol).asc_nulls_last, col(idCol).asc))))
      .withColumn("__n", count(col(valueCol)).over(wAll))
      .withColumn("__lo_rank", expr(s"(__n + ${den - 1}) DIV $den"))
      .withColumn("__hi_rank", col("__n") + 1 - col("__lo_rank"))
      .withColumn("__v_lo",
        max(when(col("__rn") === col("__lo_rank"), col(valueCol))).over(wAll))
      .withColumn("__v_hi",
        max(when(col("__rn") === col("__hi_rank"), col(valueCol))).over(wAll))
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("__v_lo")), col("__v_hi"))))
      .drop("__rn", "__n", "__lo_rank", "__hi_rank", "__v_lo", "__v_hi")
  }
}
