package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    // fixed expression tree — mirror EXACTLY in any oracle
    val covN = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val varXN = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val varYN = col("__n") * col("__syy") - col("__sy") * col("__sy")
    val slope = covN / varXN
    agg.select(
      groupCols.map(col) ++ Seq(
        col("__n").cast("long").as("n"),
        slope.as("slope"),
        ((col("__sy") - slope * col("__sx")) / col("__n")).as("intercept"),
        (covN / sqrt(varXN * varYN)).as("corr")): _*)
  }
}
