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
  private val acc = DecimalType(38, 2)

  /** Additive per-key state of `delta`: (keys..., n, total). A value that
    * overflows DECIMAL(18,2) RAISES instead of Spark's default silent
    * cast-to-null (which would count the row in `n` but drop it from
    * `total` — corrupted state with no error). The accumulator is
    * DECIMAL(38,2): 1e36 headroom, unreachable by summing 18,2 values at
    * any realistic row count.
    */
  def partial(delta: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val casted = col(valueCol).cast(dec)
    val guarded = when(col(valueCol).isNotNull && casted.isNull,
      raise_error(concat(
        lit(s"matview: $valueCol overflows DECIMAL(18,2): "),
        col(valueCol).cast("string"))).cast(dec))
      .otherwise(casted)
    // coalesce: an all-null-valued group contributes 0, not null — so in
    // refresh() a null accumulator can ONLY mean overflow (raised below)
    delta.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(guarded), lit(0).cast(acc)).cast(acc).as("total"))
  }

  /** Fold a delta's partial state into the view: key-wise addition. A
    * null total with n > 0 rows can only mean accumulator overflow —
    * raised, never stored.
    */
  def refresh(state: DataFrame, delta: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    state.unionByName(partial(delta, keys, valueCol))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).cast("long").as("n"), sum(col("total")).cast(acc).as("__t"))
      .withColumn("total",
        when(col("__t").isNull && col("n") > 0,
          raise_error(lit("matview: accumulator overflow")).cast(acc))
          .otherwise(col("__t")))
      .drop("__t")

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
