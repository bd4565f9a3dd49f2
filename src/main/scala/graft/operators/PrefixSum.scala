package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running totals over a global order — the scale-out
  * replacement for `sum(x).over(Window.orderBy(k))`, whose single
  * unpartitioned window funnels the WHOLE table through one task.
  *
  * Two-pass rank/cumsum (the classic distributed prefix sum):
  *
  *   1. Bucket the order key into `numRanges` order-preserving ranges —
  *      either caller-supplied boundaries (domain knowledge, zero extra
  *      passes) or deterministic sampled boundaries (a bounded
  *      O(numRanges·20)-row driver model, the repo's k-means-trainer
  *      convention). Either way the bucket label is a pure column
  *      expression that cannot disagree between consumers.
  *   2. Cumulate LOCALLY per bucket in parallel; recover the global
  *      running total as `bucket offset + local cumsum`, where the
  *      offsets come from a `numRanges`-row per-bucket totals table
  *      (broadcast; its cumulative fold is the only sequential work left
  *      — bounded by the bucket count, never the data).
  *
  * Plan shape: the per-bucket TOTALS are computed as a second window
  * over the SAME partitioning as the running window, so the offsets
  * branch forks ABOVE the one hash exchange and ReuseExchange
  * materializes the (possibly expensive) input exactly once in the main
  * job — not once per consumer. With explicit `boundaries` the input is
  * computed exactly once overall; with sampling, once more for the
  * bounded sample pass.
  *
  * The result equals the single-window formulation for ANY boundary
  * placement (PrefixSumSpec proves row-for-row equality, including
  * empty-bucket degenerate splits). Requires `orderCol` to be
  * long-castable (the cast is used ONLY for order-preserving bucket
  * labels; the in-bucket window orders by the original column, so
  * fractional keys stay distinct) and UNIQUE per row — with duplicate
  * keys a running total is tie-order-dependent in the single-window
  * form too.
  */
object PrefixSum {

  private val SampleFloor = 100

  /** Bucket labels come from numeric casts of the order key, and the
    * in-bucket windows order by the ORIGINAL column — the two agree
    * only when the cast is monotone in the column's own ordering, which
    * holds for numeric types (truncation toward zero is monotone) but
    * NOT for e.g. strings ("10" casts below "9" yet sorts before it).
    * Reject non-numerics loudly; NaN doubles (whose ANSI cast THROWS,
    * and which sort last) get an explicit guarded-cast + last-bucket /
    * extreme-sentinel override at each call site instead, so floating
    * order columns are safe as-is.
    */
  private def requireNumeric(df: DataFrame, c: String): Unit = {
    val dt = df.schema(c).dataType
    require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"PrefixSum order column '$c' must be numeric (cast-monotone), got $dt")
  }

  private def isFloating(df: DataFrame, c: String): Boolean =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType => true
      case _ => false
    }

  /** Long bucket key for `c`: NaN never reaches the cast (ANSI mode
    * makes `cast(NaN as long)` THROW, it does not return 0 — so an
    * unguarded cast turns a NaN row into a query failure, the loud
    * cousin of the silent wrong-bucket bug). NaN keys are nulled here;
    * the bucket expression routes them explicitly.
    */
  private def ordKey(df: DataFrame, c: String): Column =
    if (isFloating(df, c))
      when(isnan(col(c)), lit(null)).otherwise(col(c).cast("long"))
    else col(c).cast("long")

  /** Bucket label = #boundaries strictly below the key. Two renderings
    * with the same semantics:
    *
    *   - ≤ 64 boundaries (every practical numRanges): a FLAT sum of
    *     `when(key > bd, 1)` terms. The many TOP-LEVEL references to
    *     the key stop CollapseProject from inlining an expensive key
    *     expression into each term (it only inlines single-use or cheap
    *     expressions), so an order key like a quality score is computed
    *     once per row, not once per boundary. Measured: the
    *     array+filter form below evaluated a 2-regex score key
    *     boundary-count times per row (the HOF lambda body re-evaluates
    *     per element) — 7× the scan cost at numRanges = 8.
    *   - > 64 boundaries: array + filter + size (a flat when-sum this
    *     wide is fine but a fold would overflow the analyzer; the HOF
    *     keeps the expression tree O(1)). Callers at hundreds of
    *     buckets should pass a cheap (materialized) key column.
    */
  private def bucketCount(key: Column, bds: Seq[Column]): Column =
    if (bds.isEmpty) lit(0L)
    else if (bds.length <= 64)
      bds.map(bd => when(key > bd, 1L).otherwise(0L)).reduce(_ + _)
    else size(filter(array(bds: _*), bd => key > bd)).cast("long")

  def runningTotals(
      df: DataFrame,
      orderCol: String,
      valueCols: Seq[String],
      numRanges: Int = 8,
      boundaries: Option[Array[Long]] = None): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    require(numRanges > 0, s"numRanges must be positive, got $numRanges")
    requireNumeric(df, orderCol)
    val passthrough = df.columns.filterNot(_ == orderCol).map(col).toSeq
    val floating = isFloating(df, orderCol)
    val base = df.withColumn("__ord", ordKey(df, orderCol))
    val bds: Array[Long] = boundaries.getOrElse {
      val clean =
        if (floating) base.filter(!isnan(col(orderCol)))
        else base
      val sampled = clean
        .filter(col("__ord").isNotNull)
        .withColumn("__r", xxhash64(col("__ord")))
        .orderBy(col("__r")).limit(math.max(numRanges * 20, SampleFloor))
        .select(col("__ord")).collect().map(_.getLong(0)).sorted
      if (sampled.isEmpty) Array.empty[Long]
      else (1 until numRanges).map { i =>
        sampled(math.min(sampled.length - 1, i * sampled.length / numRanges))
      }.distinct.toArray
    }
    // NaN breaks the cast's monotonicity SILENTLY (cast('long') maps it
    // to 0 — a mid-range bucket — while the in-bucket window sorts NaN
    // last): route NaN keys to the LAST bucket explicitly, where the
    // window's NaN-sorts-last rule puts them in the single-window form
    // too. The sample above already excludes NaN from the boundaries.
    val rawBucket = bucketCount(col("__ord"), bds.map(lit(_)))
    val bucketExpr =
      if (floating)
        when(isnan(col(orderCol)), lit(bds.length.toLong)).otherwise(rawBucket)
      else rawBucket
    val bucketed = base.withColumn("__b", bucketExpr)
    // the window orders by the ORIGINAL column: the long cast is only
    // the bucket label, and a fractional-but-castable key (a double
    // score) must not collapse distinct keys into window ties
    val localW = Window.partitionBy(col("__b")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueCols.foldLeft(bucketed) { (acc, c) =>
      acc.withColumn(s"__cum_$c", sum(col(c)).over(localW))
    }
    // Bucket totals aggregate straight off the window OUTPUT (r17): the
    // window's exchange already hash-partitions by __b, so this groupBy
    // adds no exchange — and it replaces the former full-partition
    // `sum over Window.partitionBy(__b)` companion window, which
    // buffered the whole spine a second time just to carry a constant
    // per-bucket total to an aggregate that took its max.
    // numRanges rows: the lone unpartitioned window below is bounded by
    // construction (bucket count, not data).
    val offsets = local
      .groupBy(col("__b"))
      .agg(valueCols.map(c => sum(col(c)).as(s"__bt_$c")).head,
        valueCols.map(c => sum(col(c)).as(s"__bt_$c")).tail: _*)
      .select(col("__b") +: valueCols.map { c =>
        coalesce(sum(col(s"__bt_$c")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as(s"__off_$c")
      }: _*)
    local.join(broadcast(offsets), Seq("__b"))
      .select(col(orderCol) +: (passthrough ++ valueCols.map { c =>
        (col(s"__off_$c") + col(s"__cum_$c")).as(s"cum_$c")
      }): _*)
  }

  /** [[runningTotals]] WITHIN groups — the scale-out replacement for
    * `sum(x).over(Window.partitionBy(g…).orderBy(k))` when the group
    * count is small (parallelism = |groups| in the naive form: a few
    * heavy groups at 100 TB each funnel through one task). Range-buckets
    * the order key exactly as [[runningTotals]] does and partitions the
    * local windows by (group, bucket) — parallelism |groups|·numRanges —
    * then recovers each group's global running total from a per-(group,
    * bucket) totals table whose per-group prefix fold is bounded by the
    * bucket count, never the data.
    *
    * Boundaries are sampled GLOBALLY (one bounded pass, not one per
    * group); the result equals the per-group single-window form for any
    * boundary placement — a group straddling few buckets just gets less
    * parallelism, never a different answer (GroupedPrefixSumSpec proves
    * row equality). `orderCol` must be numeric and unique PER GROUP
    * (same tie caveat as the single-window form). Null group keys are
    * fine: the offsets join is NULL-SAFE (`<=>`), matching the window
    * form's null-is-a-partition semantics instead of silently dropping
    * null-keyed rows as a plain equi-join would.
    */
  def runningTotalsGrouped(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      valueCols: Seq[String],
      numRanges: Int = 8): DataFrame = {
    require(groupCols.nonEmpty,
      "need at least one group column (use runningTotals for the global form)")
    require(valueCols.nonEmpty, "need at least one value column")
    require(numRanges > 0, s"numRanges must be positive, got $numRanges")
    requireNumeric(df, orderCol)
    val floating = isFloating(df, orderCol)
    val base = df.withColumn("__ord", ordKey(df, orderCol))
    val clean =
      if (floating) base.filter(!isnan(col(orderCol)))
      else base
    val sampled = clean
      .filter(col("__ord").isNotNull)
      .withColumn("__r", xxhash64(col("__ord")))
      .orderBy(col("__r")).limit(math.max(numRanges * 20, SampleFloor))
      .select(col("__ord")).collect().map(_.getLong(0)).sorted
    val bds: Array[Long] =
      if (sampled.isEmpty) Array.empty[Long]
      else (1 until numRanges).map { i =>
        sampled(math.min(sampled.length - 1, i * sampled.length / numRanges))
      }.distinct.toArray
    val rawBucket = bucketCount(col("__ord"), bds.map(lit(_)))
    val bucketExpr =
      if (floating)
        when(isnan(col(orderCol)), lit(bds.length.toLong)).otherwise(rawBucket)
      else rawBucket
    val bucketed = base.withColumn("__b", bucketExpr)
    val part = groupCols.map(col) :+ col("__b")
    val localW = Window.partitionBy(part: _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueCols.foldLeft(bucketed) { (acc, c) =>
      acc.withColumn(s"__cum_$c", sum(col(c)).over(localW))
    }
    // |groups|·numRanges rows, aggregated off the window output on its
    // own exchange (no extra shuffle, no full-partition companion
    // window — see runningTotals); the per-group prefix fold is over ≤
    // numRanges rows per partition — bounded by construction.
    val gKeys = groupCols.indices.map(i => s"__g$i")
    val offsets = local
      .groupBy(part: _*)
      .agg(valueCols.map(c => sum(col(c)).as(s"__bt_$c")).head,
        valueCols.map(c => sum(col(c)).as(s"__bt_$c")).tail: _*)
      .select(groupCols.zip(gKeys).map { case (c, g) => col(c).as(g) } ++
        Seq(col("__b").as("__ob")) ++ valueCols.map { c =>
          coalesce(sum(col(s"__bt_$c")).over(
            Window.partitionBy(groupCols.map(col): _*).orderBy(col("__b"))
              .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)).as(s"__off_$c")
        }: _*)
    val cond = groupCols.zip(gKeys)
      .map { case (c, g) => local(c) <=> offsets(g) }
      .reduce(_ && _) && (local("__b") === offsets("__ob"))
    local.join(broadcast(offsets), cond)
      .select(df.columns.map(local(_)) ++ valueCols.map { c =>
        (col(s"__off_$c") + col(s"__cum_$c")).as(s"cum_$c")
      }: _*)
  }

  /** [[runningTotals]] generalized to a MULTI-COLUMN, mixed-direction
    * total order — the scale-out replacement for
    * `sum(x).over(Window.orderBy(a.desc, b.asc, …))` (the ABC/Pareto/
    * ntile ranking shape). Each order column must be long-castable and
    * NON-NULL; descending directions negate the key (two's-complement
    * safe for every value except Long.MinValue, far past any real
    * ranking key), reducing the problem to ascending lexicographic
    * order; bucketing then uses sampled struct boundaries and a flat
    * array + lexicographic-compare lambda. The combined order must be
    * total (include a unique tiebreak column), exactly as the
    * single-window form requires for a deterministic cumsum.
    */
  def runningTotalsOrdered(
      df: DataFrame,
      orderCols: Seq[(String, Boolean)], // (column, ascending)
      valueCols: Seq[String],
      numRanges: Int = 8): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(valueCols.nonEmpty, "need at least one value column")
    require(numRanges > 0, s"numRanges must be positive, got $numRanges")
    orderCols.foreach { case (c, _) => requireNumeric(df, c) }
    val keyNames = orderCols.indices.map(i => s"__o$i")
    // NaN would cast to 0 (a mid-range key) while the window sorts it as
    // the LARGEST value (last ascending, first descending): pin NaN to
    // the matching extreme of the long key space so the bucket label
    // stays monotone in window order. Real castable doubles live within
    // ±2^53, far from either sentinel.
    val base = orderCols.zip(keyNames).foldLeft(df) {
      case (acc, ((c, asc), kn)) =>
        val cast = if (asc) col(c).cast("long") else -col(c).cast("long")
        val key =
          if (isFloating(df, c)) {
            val sentinel = if (asc) Long.MaxValue else Long.MinValue
            when(isnan(col(c)), lit(sentinel)).otherwise(cast)
          } else cast
        acc.withColumn(kn, key)
    }
    val sampled = base
      .withColumn("__r", xxhash64(keyNames.map(col): _*))
      .orderBy(col("__r")).limit(math.max(numRanges * 20, SampleFloor))
      .select(keyNames.map(col): _*).collect()
      .map(r => keyNames.indices.map(r.getLong).toVector)
      .sortBy(identity)(Ordering.Implicits.seqOrdering[Vector, Long])
    val boundaries =
      if (sampled.isEmpty) Array.empty[Vector[Long]]
      else (1 until numRanges).map { i =>
        sampled(math.min(sampled.length - 1, i * sampled.length / numRanges))
      }.distinct.toArray
    // lexicographic "row is after boundary" with the boundary as plain
    // LITERALS — the ≤64 path is a flat when-sum (multiple top-level key
    // references, so CollapseProject keeps expensive key expressions
    // materialized, see bucketCount); the wide path falls back to the
    // struct-array HOF.
    def afterLit(bd: Vector[Long]): Column =
      keyNames.zip(bd).foldRight(lit(false)) { case ((kn, v), tail) =>
        col(kn) > lit(v) || (col(kn) === lit(v) && tail)
      }
    def afterCol(bd: Column): Column =
      keyNames.foldRight(lit(false)) { (kn, tail) =>
        col(kn) > bd(kn) || (col(kn) === bd(kn) && tail)
      }
    val bucketExpr =
      if (boundaries.isEmpty) lit(0L)
      else if (boundaries.length <= 64)
        boundaries.map(bd => when(afterLit(bd), 1L).otherwise(0L))
          .reduce(_ + _)
      else size(filter(
        array(boundaries.map(bd =>
          struct(keyNames.zip(bd).map { case (kn, v) => lit(v).as(kn) }: _*)): _*),
        bd => afterCol(bd))).cast("long")
    val bucketed = base.withColumn("__b", bucketExpr)
    // order by the ORIGINAL columns with their declared directions (the
    // negated long casts are bucket labels only — a fractional key must
    // not collapse into ties)
    val localSort = orderCols.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc
    }
    val localW = Window.partitionBy(col("__b"))
      .orderBy(localSort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueCols.foldLeft(bucketed) { (acc, c) =>
      acc.withColumn(s"__cum_$c", sum(col(c)).over(localW))
    }
    // bucket totals off the window output, no companion full-partition
    // window — see runningTotals
    val offsets = local
      .groupBy(col("__b"))
      .agg(valueCols.map(c => sum(col(c)).as(s"__bt_$c")).head,
        valueCols.map(c => sum(col(c)).as(s"__bt_$c")).tail: _*)
      .select(col("__b") +: valueCols.map { c =>
        coalesce(sum(col(s"__bt_$c")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as(s"__off_$c")
      }: _*)
    local.join(broadcast(offsets), Seq("__b"))
      .select(df.columns.map(col) ++ valueCols.map { c =>
        (col(s"__off_$c") + col(s"__cum_$c")).as(s"cum_$c")
      }: _*)
  }

  /** Distributed running MAX of `valueCol` over `orderCol` order — the
    * scale-out replacement for `max(v).over(Window.orderBy(k))`. Same
    * two-pass shape as [[runningTotals]]: bucket-local running max +
    * prefix-max of per-bucket totals (a numRanges-row table), combined
    * with null-skipping `greatest`.
    *
    * `exclusive = true` gives the `rowsBetween(unboundedPreceding, -1)`
    * frame (max of strictly-PRECEDING rows; null for the globally first
    * row) — the skyline dominance shape. With `exclusive`, `orderCol`
    * must be unique per row (an exclusive frame is tie-order-dependent
    * in the single-window form too). Bucketing casts `orderCol` to
    * double for boundary literals (order-preserving for numerics below
    * 2^53); the in-bucket window orders by the ORIGINAL column, so
    * bucket coarseness never reorders rows. Output adds
    * `runmax_<valueCol>`.
    */
  def runningMax(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      numRanges: Int = 8,
      exclusive: Boolean = false): DataFrame = {
    require(numRanges > 0, s"numRanges must be positive, got $numRanges")
    requireNumeric(df, orderCol)
    val base = df.withColumn("__ord", col(orderCol).cast("double"))
    val sampled = base
      .filter(col("__ord").isNotNull)
      .withColumn("__r", xxhash64(col("__ord")))
      .orderBy(col("__r")).limit(math.max(numRanges * 20, SampleFloor))
      .select(col("__ord")).collect().map(_.getDouble(0)).sorted
    val boundaries =
      if (sampled.isEmpty) Array.empty[Double]
      else (1 until numRanges).map { i =>
        sampled(math.min(sampled.length - 1, i * sampled.length / numRanges))
      }.distinct.toArray
    val bucketExpr = bucketCount(col("__ord"), boundaries.map(lit(_)))
    val bucketed = base.withColumn("__b", bucketExpr)
    val frameEnd = if (exclusive) -1L else 0L
    val localW = Window.partitionBy(col("__b")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    val local = bucketed
      .withColumn("__lmax", max(col(valueCol)).over(localW))
    // per-bucket maxima off the window output (no companion
    // full-partition window — see runningTotals): numRanges rows;
    // prefix-max EXCLUDES the own bucket (its contribution is already
    // in the local window)
    val offsets = local.groupBy(col("__b"))
      .agg(max(col(valueCol)).as("__bmax"))
      .select(col("__b"),
        max(col("__bmax")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1))
          .as("__off"))
    local.join(broadcast(offsets), Seq("__b"))
      .withColumn(s"runmax_$valueCol", greatest(col("__lmax"), col("__off")))
      .drop("__ord", "__b", "__lmax", "__off")
  }
}
