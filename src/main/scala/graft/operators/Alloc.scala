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

  /** Huntington–Hill (equal-proportions) apportionment — the US House
    * method: every party seats one mandatory member, then the
    * remaining `seats − P` go one at a time to the highest priority
    * w_i/√(s(s+1)) (s = seats already held). The square root is NEVER
    * evaluated: priority(j,m) > priority(i,k) ⟺ w_j²·k(k+1) >
    * w_i²·m(m+1) — an exact DECIMAL(38,0) cross-multiplication — and
    * exact ties break by (name, seat-index) ascending, a total order,
    * so Σseats = `seats` by construction and any engine replays the
    * census bit-identically. The geometric-mean divisor is what
    * distinguishes it from [[dhondt]]'s arithmetic divisors (HH is
    * kinder to small parties; emit both and the divergence is the
    * method-choice audit).
    *
    * `df` is the bounded one-row-per-party frame (post-aggregate,
    * never data). Cost is the full priority-pair grid
    * (P·(seats−P))² comparisons off a broadcast copy — guarded at
    * P·(seats−P) ≤ 10⁴ (10⁸ comparisons); an isqrt-counting shape
    * would lift the bound but no caller needs it. Weights must be
    * positive and ≤ 10⁹ (w²·k(k+1) stays inside DECIMAL(38,0) for
    * seats ≤ 10⁴ — both guarded loudly).
    *
    * Result: one row per party `(nameCol, hh_seats)`.
    */
  def huntingtonHill(
      df: DataFrame,
      nameCol: String,
      weightCol: String,
      seats: Long): DataFrame = {
    require(seats >= 1 && seats <= 10000L,
      s"seats must be in [1, 10000]: $seats")
    val base = df.select(col(nameCol),
      when(col(weightCol).cast("long") <= 0,
        raise_error(lit("huntingtonHill: weights must be positive")).cast("long"))
        .when(col(weightCol).cast("long") > 1000000000L,
          raise_error(lit("huntingtonHill: weight exceeds the 10^9 " +
            "DECIMAL(38,0) priority envelope")).cast("long"))
        .otherwise(col(weightCol).cast("long")).as("__v"))
      .localCheckpoint(true) // bounded party frame; count + grid share it
    val p = base.count()
    require(p >= 1, "huntingtonHill: empty party frame")
    require(p <= seats,
      s"huntingtonHill: $p parties exceed $seats seats (every party " +
        "seats one mandatory member)")
    val extra = seats - p
    if (extra == 0) {
      base.select(col(nameCol), lit(1L).as("hh_seats"))
    } else {
      require(p * extra <= 10000L,
        s"huntingtonHill: priority grid $p * $extra exceeds the 10^4 " +
          "pair-grid bound")
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      // __k = seats already held (>= 1, the mandatory member), the row
      // contesting seat __k+1 with divisor sqrt(__k(__k+1)); a party
      // can gain at most `extra` beyond its mandatory seat
      val grid = base
        .withColumn("__k", explode(sequence(lit(1L), lit(extra))))
        .withColumn("__pri", col("__v").cast(dec) * col("__v"))
      val opp = grid.select(col(nameCol).as("__o_name"),
        col("__pri").as("__o_pri"), col("__k").as("__o_k"))
      grid.crossJoin(broadcast(opp))
        .withColumn("__lhs", col("__o_pri") * col("__k") * (col("__k") + 1))
        .withColumn("__rhs", col("__pri") * col("__o_k") * (col("__o_k") + 1))
        // the self-pair contributes 0 (a filter instead would drop a
        // single-party grid to zero rows and lose the party entirely)
        .withColumn("__maj",
          when(col("__o_name") === col(nameCol) && col("__o_k") === col("__k"),
            0L)
          .when(col("__lhs") > col("__rhs") ||
            (col("__lhs") === col("__rhs") &&
              (col("__o_name") < col(nameCol) ||
                (col("__o_name") === col(nameCol) && col("__o_k") < col("__k")))),
            1L).otherwise(0L))
        .groupBy(col(nameCol), col("__k"))
        .agg(sum(col("__maj")).as("__rank"))
        .groupBy(col(nameCol))
        .agg((lit(1L) +
          sum(when(col("__rank") < extra, 1L).otherwise(0L))).as("hh_seats"))
    }
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
