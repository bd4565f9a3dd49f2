package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile normalization across groups (Bolstad et al. 2003, the
  * microarray batch-effect correction): each group's value distribution
  * is mapped onto the POOLED distribution, so a doc at its source's
  * p-th percentile receives the pooled p-th percentile's value —
  * heterogeneous per-source score scales become comparable before
  * mixture sampling or curriculum ordering.
  *
  * Everything is integer arithmetic on ranks, so the mapping replays
  * bit-identically on any engine: within-group rank r (0-based, ties
  * broken by the id column — a total order), target pooled index
  * ti = (r · (N-1)) div (n_g - 1) (ti = 0 when the group is a
  * singleton), and the pooled value at index ti.
  *
  * 100 TB shape: NO corpus-global window anywhere. The within-group
  * rank partitions by group; the pooled order statistic is resolved
  * against the DISTINCT-VALUE cumulative spine — per-value counts,
  * cumulative-summed over the (vocabulary-sized) distinct values, then
  * a broadcast range join of ti into [lo, hi) value intervals. The
  * corpus is scanned once, shuffled once (the group window), and the
  * spine is the only broadcast state.
  */
object QuantileNorm {

  /** Adds `norm_val`: the pooled `valueCol` order statistic at this
    * row's within-`groupCol` quantile. `idCol` breaks rank ties so the
    * result is a pure function of the data. `valueCol` must be
    * integral-typed (the point is exact cross-engine replay).
    */
  def normalize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String): DataFrame = {
    val ranked = df
      .withColumn("src_rank",
        (row_number().over(Window.partitionBy(col(groupCol))
          .orderBy(col(valueCol), col(idCol))) - 1).cast("long"))
      .withColumn("n_grp",
        count(lit(1)).over(Window.partitionBy(col(groupCol))).cast("long"))
    val total = df.agg(count(lit(1)).cast("long").as("n_total"))
    // distinct-value cumulative spine: value v covers pooled indices
    // [lo, lo + cnt). Cumulated via the DISTRIBUTED two-pass prefix sum
    // (r10) — the spine is |distinct values|-sized, which at corpus
    // scale can be data-sized, so no single-partition window here.
    val spine = PrefixSum.runningTotals(
        df.groupBy(col(valueCol).as("__v"))
          .agg(count(lit(1)).cast("long").as("__cnt")),
        "__v", Seq("__cnt"), numRanges = 8)
      .select(col("__v"), (col("cum___cnt") - col("__cnt")).as("__lo"),
        col("cum___cnt").as("__hi"))
    // the rank·total product runs through DECIMAL(38,0): at corpus scale
    // (group rank ~1e9 × total ~1e10) a 64-bit product would wrap
    // silently under non-ANSI mode and the garbage index would match no
    // spine interval — a silently dropped row; the decimal product is
    // exact and `div` lands back in BIGINT (the quotient is < n_total)
    ranked.crossJoin(broadcast(total))
      .withColumn("target_idx",
        when(col("n_grp") === 1L, lit(0L)).otherwise(
          expr("(CAST(src_rank AS DECIMAL(38,0)) * (n_total - 1)) div (n_grp - 1)")))
      .join(broadcast(spine),
        col("target_idx") >= col("__lo") && col("target_idx") < col("__hi"))
      .withColumn("norm_val", col("__v"))
      .drop("__v", "__lo", "__hi", "n_grp", "n_total")
  }
}
