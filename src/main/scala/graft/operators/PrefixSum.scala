package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running totals over a global order — the scale-out
  * replacement for `sum(x).over(Window.orderBy(k))`, whose single
  * unpartitioned window funnels the WHOLE table through one task.
  *
  * Two-pass rank/cumsum (the classic distributed prefix sum):
  *
  *   1. Bucket the order key into `numRanges` order-preserving ranges
  *      (deterministic sampled boundaries — a bounded
  *      O(numRanges·20)-row driver model, the repo's k-means-trainer
  *      convention, so the bucket label is a pure column expression that
  *      cannot disagree between consumers).
  *   2. Cumulate LOCALLY per bucket in parallel; recover the global
  *      running total as `bucket offset + local cumsum`, where the
  *      offsets come from a `numRanges`-row per-bucket totals table
  *      (broadcast; its cumulative fold is the only sequential work left
  *      — bounded by the bucket count, never the data).
  *
  * The result equals the single-window formulation for ANY boundary
  * placement (PrefixSumSpec proves row-for-row equality, including
  * empty-bucket degenerate splits). Requires `orderCol` to be
  * long-castable and UNIQUE per row — with duplicate keys a running
  * total is tie-order-dependent in the single-window form too.
  */
object PrefixSum {

  def runningTotals(
      df: DataFrame,
      orderCol: String,
      valueCols: Seq[String],
      numRanges: Int = 8): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    require(numRanges > 0, s"numRanges must be positive, got $numRanges")
    val passthrough = df.columns.filterNot(_ == orderCol).map(col).toSeq
    val base = df.withColumn("__ord", col(orderCol).cast("long"))
    val sampled = base
      .withColumn("__r", xxhash64(col("__ord")))
      .orderBy(col("__r")).limit(math.max(numRanges * 20, 100))
      .select(col("__ord")).collect().map(_.getLong(0)).sorted
    val boundaries =
      if (sampled.isEmpty) Array.empty[Long]
      else (1 until numRanges).map { i =>
        sampled(math.min(sampled.length - 1, i * sampled.length / numRanges))
      }.distinct.toArray
    // bucket = #boundaries strictly below the key. A FLAT array + filter
    // + size, not a folded when-chain: a fold nests one expression level
    // per boundary and overflows the analyzer stack past a few hundred
    // buckets.
    val bucketExpr =
      if (boundaries.isEmpty) lit(0L)
      else size(filter(array(boundaries.map(lit(_)): _*),
        bd => col("__ord") > bd)).cast("long")
    val bucketed = base.withColumn("__b", bucketExpr)
    val localW = Window.partitionBy(col("__b")).orderBy(col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueCols.foldLeft(bucketed) { (acc, c) =>
      acc.withColumn(s"__cum_$c", sum(col(c)).over(localW))
    }
    // numRanges rows: the lone unpartitioned window, bounded by
    // construction (bucket count, not data).
    val offsets = bucketed.groupBy(col("__b"))
      .agg(valueCols.map(c => sum(col(c)).as(s"__tot_$c")).head,
        valueCols.map(c => sum(col(c)).as(s"__tot_$c")).tail: _*)
      .select(col("__b") +: valueCols.map { c =>
        coalesce(sum(col(s"__tot_$c")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as(s"__off_$c")
      }: _*)
    local.join(broadcast(offsets), Seq("__b"))
      .select(col(orderCol) +: (passthrough ++ valueCols.map { c =>
        (col(s"__off_$c") + col(s"__cum_$c")).as(s"cum_$c")
      }): _*)
  }
}
