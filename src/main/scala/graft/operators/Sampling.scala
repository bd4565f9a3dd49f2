package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines. Both
  * operators are pure plan transforms — re-running them on the same input
  * yields the same rows regardless of partitioning, task order, or
  * cluster size, which is what makes 100 TB dataset builds reproducible
  * (Spark's `sample()` is seed-stable only per partitioning).
  */
object Sampling {

  /** Stratified head-sample: up to `n` rows per stratum, chosen by
    * ascending `orderCol` (ties impossible when it's a key). The rn <= n
    * filter plans as WindowGroupLimit, so every task keeps at most `n`
    * rows per stratum BEFORE the stratum shuffle — the shuffle carries
    * O(strata × n) rows per task, never the corpus.
    */
  def stratifiedHead(df: DataFrame, strata: Seq[String], orderCol: String, n: Int): DataFrame = {
    require(n > 0)
    val w = Window.partitionBy(strata.map(col): _*).orderBy(col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Leakage-free split assignment: `xxhash64(key, seed)` buckets each row
    * into the named splits by weight. The SAME key always lands in the
    * SAME split — across runs, partitionings, and joins against other
    * tables keyed the same way (the property random assignment lacks).
    * Zero shuffle: one codegen'd projection.
    */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      seed: Long = 42L,
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0))
    val total = splits.map(_._2).sum
    val buckets = 1 << 20
    val bucket = pmod(xxhash64(col(keyCol), lit(seed)), lit(buckets.toLong))
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail.map(c => (c / total * buckets).toLong)
    val assigned = splits.zip(cuts).init.foldRight(lit(splits.last._1)) {
      case (((name, _), cut), elseCol) => when(bucket < cut, lit(name)).otherwise(elseCol)
    }
    df.withColumn(splitCol, assigned)
  }
}
