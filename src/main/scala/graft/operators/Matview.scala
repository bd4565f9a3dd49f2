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
    // Sum at FULL accumulator precision: sum over DECIMAL(18,2) would be
    // DECIMAL(28,2), whose overflow nulls BEFORE any cast to the (38,2)
    // accumulator — and a bare coalesce would mask that null as total=0
    // with n > 0 (corrupted state, no error). Summing (38,2) values keeps
    // the 1e36 headroom, and a null sum alongside non-null inputs is
    // raised here, so the coalesce-to-0 only covers genuinely all-null
    // groups.
    delta.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(guarded.cast(acc)).as("__s"),
        count(col(valueCol)).as("__nv"))
      .withColumn("total",
        when(col("__s").isNull && col("__nv") > 0,
          raise_error(lit("matview: accumulator overflow in partial")).cast(acc))
          .otherwise(coalesce(col("__s"), lit(0).cast(acc))).cast(acc))
      .drop("__s", "__nv")
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

  /** Incremental JOIN-view maintenance — the classic delta rule
    * (Blakeley, Larson & Tompa 1986, "Efficiently updating
    * materialized views"): for the inner-join view V = A ⋈ B under
    * append-only deltas,
    *
    *   V' = V ∪ (ΔA ⋈ (B ∪ ΔB)) ∪ ((A \ ΔA… i.e. the PRE-delta A) ⋈ ΔB)
    *
    * — the new-left×all-right term plus the old-left×new-right term
    * cover every new pair exactly once (ΔA⋈ΔB lands in the first
    * term), so the refreshed view equals the full recompute without
    * ever rescanning A ⋈ B. Per refresh the joins are O(|Δ| ⋈) with
    * the delta side BROADCAST when small — the 100 TB shape of
    * maintaining a fact⋈fact view under hourly appends. Both inputs
    * must be append-only for this rule (deletes need the multiset
    * counting extension); `aPre`/`b`/`deltaB` are the pre-refresh A,
    * pre-refresh B, and the two delta batches.
    */
  def refreshJoin(
      view: DataFrame,
      aPre: DataFrame,
      deltaA: DataFrame,
      b: DataFrame,
      deltaB: DataFrame,
      keys: Seq[String]): DataFrame =
    view
      .unionByName(deltaA.join(b.unionByName(deltaB), keys))
      .unionByName(aPre.join(deltaB, keys))
}
