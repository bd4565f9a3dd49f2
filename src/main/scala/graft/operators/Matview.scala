package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental materialized-view maintenance for additive aggregates:
  * keep (keys, n, total) state and fold each new delta batch in by key
  * addition — `merge(state, partial(delta))` — instead of rescanning the
  * corpus. This is the 100 TB shape of every "dashboard over an append
  * stream" job: per refresh the work is O(delta) + a shuffle of O(changed
  * keys), while a naive refresh rereads everything.
  *
  * Counts and DECIMAL sums are exactly mergeable (integer/decimal
  * addition is associative — no FP drift across refresh schedules, so ANY
  * batch split yields the bit-identical view; MatviewSpec asserts it).
  * Derived ratios (avg) are computed at READ time from the additive
  * state, never stored — storing them would break mergeability.
  */
object Matview {

  private val dec = DecimalType(18, 2)

  /** Additive per-key state of `delta`: (keys..., n, total). */
  def partial(delta: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    delta.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol).cast(dec)).as("total"))

  /** Fold a delta's partial state into the view: key-wise addition. */
  def refresh(state: DataFrame, delta: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    state.unionByName(partial(delta, keys, valueCol))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("total")).cast(DecimalType(28, 2)).as("total"))

  /** Read-time projection of the additive state: derived columns computed
    * on demand from (n, total).
    */
  def read(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++ Seq(
        col("n"),
        col("total").cast("double").as("total"),
        (col("total").cast("double") / col("n").cast("double")).as("avg")): _*)
}
