package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact integer budget apportionment — the operator behind both revenue
  * budgeting (q_alloc_budget) and training-data token allocation
  * (q_token_alloc): given bounded cells with non-negative integer
  * weights, split an integer `budget` proportionally with ZERO float
  * division.
  */
object Alloc {

  /** Largest-remainder (Hamilton) apportionment: every cell takes its
    * floor share ⌊budget·w/W⌋; the `budget − Σfloor` leftover units go
    * one each to the largest remainders (budget·w mod W), ties broken
    * by the key columns ascending — fully deterministic, Σalloc =
    * budget by construction, and `alloc_total` rides along so callers
    * can emit the sum-to-budget law as a per-row certificate.
    *
    * Scale shape: callers pass the POST-AGGREGATE cell frame (a
    * bounded category breakdown, not data) — all four global
    * sums/ranks run as windows over that pinned frame, the
    * q_alloc_budget r16 shape (zero BroadcastNestedLoopJoins). The
    * per-row product budget·w runs in BIGINT with a LOUD per-row
    * guard at w > Long.Max/budget — overflow raises, never wraps.
    * W = 0 (all-zero weights) allocates 0 everywhere rather than
    * dividing by zero.
    */
  def hamilton(
      cells: DataFrame,
      keyCols: Seq[String],
      weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    require(keyCols.nonEmpty, "need at least one key column for the tie-break")
    val keys = keyCols.map(col)
    val wBound = Long.MaxValue / math.max(budget, 1L)
    val wAll = Window.partitionBy()
    val wRk = Window.orderBy(col("rem_key").desc +: keys.map(_.asc): _*)
    cells
      .select(keys :+ col(weightCol).cast("long").as("weight"): _*)
      .withColumn("weight",
        when(col("weight") < 0,
          raise_error(lit("hamilton: negative weight")).cast("long"))
          .when(col("weight") > wBound,
            raise_error(lit(s"hamilton: weight * budget=$budget exceeds BIGINT " +
              s"(per-row bound $wBound)")).cast("long"))
          .otherwise(col("weight")))
      .localCheckpoint(true) // bounded cell frame, five window consumers
      .withColumn("__total", sum(col("weight")).over(wAll))
      .withColumn("base_alloc",
        when(col("__total") === 0, 0L)
          .otherwise(expr(s"(${budget}L * weight) div __total")))
      .withColumn("rem_key",
        when(col("__total") === 0, 0L)
          .otherwise(expr(s"(${budget}L * weight) % __total")))
      .withColumn("__bt", sum(col("base_alloc")).over(wAll))
      .withColumn("__rk", row_number().over(wRk).cast("long"))
      .withColumn("alloc",
        when(col("__total") === 0, 0L).otherwise(
          col("base_alloc") +
            when(col("__rk") <= lit(budget) - col("__bt"), 1L).otherwise(0L)))
      .withColumn("alloc_total", sum(col("alloc")).over(wAll))
      .drop("__total", "__bt", "__rk")
  }

  /** D'Hondt (highest-averages) apportionment: party i's k-th seat
    * exists iff the quotient w_i/k ranks inside the global top
    * `seats`. No quotient is ever EVALUATED — the rank is counted
    * exactly by cross-multiplication: opponent j contributes
    * #\{m : w_j/m > w_i/k\} = clamp((w_j·k − 1) div w_i, 0, seats)
    * strict majorants, the party itself its own k−1 higher quotients,
    * and exact ties (w_j·k ≡ 0 mod w_i with the tied m in range) break
    * by name ascending — a total order, so the census is deterministic
    * on any engine and Σseats = `seats` by construction (the top-S cut
    * of a totally ordered set). Favors larger parties vs [[hamilton]]
    * — emit both and the divergence is the method-choice audit.
    *
    * `df` is the bounded one-row-per-party frame (post-aggregate,
    * never data); work is seats·|parties|² comparisons off a broadcast
    * opponent copy — constant in SF. Weights must be positive; the
    * product w_j·seats must fit BIGINT (guarded loudly).
    *
    * Result: one row per party `(nameCol, dhondt_seats)`.
    */
  def dhondt(
      df: DataFrame,
      nameCol: String,
      weightCol: String,
      seats: Long): DataFrame = {
    require(seats >= 1, s"seats must be >= 1: $seats")
    val wBound = Long.MaxValue / math.max(seats, 1L)
    val base = df.select(col(nameCol),
      when(col(weightCol).cast("long") <= 0,
        raise_error(lit("dhondt: weights must be positive")).cast("long"))
        .when(col(weightCol).cast("long") > wBound,
          raise_error(lit(s"dhondt: weight * seats=$seats exceeds BIGINT"))
            .cast("long"))
        .otherwise(col(weightCol).cast("long")).as("__v"))
      .localCheckpoint(true) // bounded party frame; grid + opponents share it
    val opp = base.select(col(nameCol).as("__o_name"), col("__v").as("__o_v"))
    base
      .withColumn("__k", explode(sequence(lit(1L), lit(seats))))
      .crossJoin(broadcast(opp))
      .withColumn("__contrib", when(col("__o_name") === col(nameCol), 0L)
        .otherwise(
          least(lit(seats), greatest(lit(0L),
            expr("(__o_v * __k - 1) div __v"))) +
          when(expr("(__o_v * __k) % __v") === 0L &&
               expr("(__o_v * __k) div __v").between(1L, seats) &&
               col("__o_name") < col(nameCol), 1L).otherwise(0L)))
      .groupBy(col(nameCol), col("__k"))
      .agg(sum(col("__contrib")).as("__others"))
      .withColumn("__rk", col("__k") - 1L + col("__others"))
      .groupBy(col(nameCol))
      .agg(sum(when(col("__rk") < seats, 1L).otherwise(0L)).as("dhondt_seats"))
  }
}
