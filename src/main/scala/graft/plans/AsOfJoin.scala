package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native backward as-of join — the full custom-operator stack (option (c)
  * of the build brief): a [[AsOfJoinPlan logical operator]], a
  * [[AsOfJoinStrategy planning strategy]], and a [[AsOfJoinExec physical
  * operator]], attached per-session via `experimental.extraStrategies`.
  *
  * Semantics (same as [[graft.operators.Joins.asofBackward]], the
  * composition it replaces in the hot path): for every left row, attach
  * the right row with the LARGEST `rightOn <= leftOn` within the same
  * `by` key — DuckDB `ASOF JOIN`, pandas `merge_asof`. Rows with no
  * earlier right row get nulls (left join).
  *
  * Why a physical operator beats the union+window composition:
  *   - the composition shuffles |L| + |R| unioned rows, then buffers a
  *     running window with a carried struct; this exec shuffles each side
  *     independently (the same total bytes but no union/null-padding
  *     blowup), then streams a SINGLE forward merge per partition with
  *     O(1) state — one buffered right row, no window frame;
  *   - Catalyst still owns distribution/ordering: the exec only declares
  *     `requiredChildDistribution`/`requiredChildOrdering` and
  *     EnsureRequirements plans the exchanges and sorts (AQE applies as
  *     usual), so at 100 TB the join inherits skew handling and reuses
  *     any pre-bucketed layout on the by-key.
  *
  * Null semantics: by-keys compare with natural null-first ordering, so
  * null keys group together (documented divergence from SQL join
  * equality, which drops them); a null `on` on EITHER side never
  * matches, in either direction (SQL comparison semantics — DuckDB ASOF
  * and merge_asof agree): null right rows are consumed without being
  * retained, null left rows emit misses.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    leftOn: Attribute,
    rightOn: Attribute,
    rightValues: Seq[Attribute],
    forward: Boolean = false,
    toleranceUs: Long = -1L) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lb, rb, lo, ro, rv, fwd, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lb, rb, lo, ro, rv, fwd, tol) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    leftOn: Attribute,
    rightOn: Attribute,
    rightValues: Seq[Attribute],
    forward: Boolean = false,
    toleranceUs: Long = -1L) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  // Hash-cluster both sides on the by-key; sort each partition by
  // (by, on). EnsureRequirements inserts the exchanges/sorts — or elides
  // them when a bucketed layout already satisfies the distribution. An
  // empty by-key (global as-of over one series) degenerates to AllTuples:
  // both sides in a single partition, one merge.
  override def requiredChildDistribution: Seq[Distribution] =
    if (leftBy.isEmpty)
      Seq(org.apache.spark.sql.catalyst.plans.physical.AllTuples,
        org.apache.spark.sql.catalyst.plans.physical.AllTuples)
    else Seq(ClusteredDistribution(leftBy), ClusteredDistribution(rightBy))

  // Forward direction: the `on` columns sort DESCENDING (keys still
  // ascending), which turns "last right row at-or-before" into "last
  // right row at-or-after in reverse time" = the EARLIEST right row
  // >= leftOn — the same O(1)-state merge, one flipped comparator.
  private def onOrder(a: Attribute): SortOrder =
    SortOrder(a, if (forward) org.apache.spark.sql.catalyst.expressions.Descending
                 else Ascending)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftBy.map(a => SortOrder(a, Ascending)) :+ onOrder(leftOn),
    rightBy.map(a => SortOrder(a, Ascending)) :+ onOrder(rightOn))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftBy.map(a => SortOrder(a, Ascending)) :+ onOrder(leftOn)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftBy, lOut)
      val rKeyProj = UnsafeProjection.create(rightBy, rOut)
      val lOnProj = UnsafeProjection.create(Seq(leftOn), lOut)
      val rOnProj = UnsafeProjection.create(Seq(rightOn), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(leftBy.map(_.dataType))
      val onOrd = RowOrdering.createNaturalAscendingOrdering(Seq(leftOn.dataType))
      // Right values read through the null-padded row on misses. Binding
      // takes nullability from the INPUT schema, so the right attributes
      // must be declared nullable there too — a non-nullable double would
      // skip the null check and read the padded slot as 0.0.
      val outProj = UnsafeProjection.create(
        lOut ++ rightValues.map(_.withNullability(true)),
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // The latest right row with rightOn <= current leftOn, valid for
        // the CURRENT left key only: both inputs arrive sorted by
        // (key, on), so a left-key change invalidates it — no per-advance
        // right-key copy/projection needed (that pair of allocations per
        // advanced right row was the r2 bench regression's hot spot).
        private var lastRight: InternalRow = _
        private var curKey: InternalRow = _ // copied once per distinct left key

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          if (curKey == null || keyOrd.compare(curKey, lKey) != 0) {
            curKey = lKey.copy()
            lastRight = null
          }
          val lOn = lOnProj(lRow)
          // A null left `on` is a MISS in both directions (SQL
          // comparison semantics — DuckDB ASOF and merge_asof agree).
          // Backward gets this for free (null sorts first, the advance
          // condition fails); forward must short-circuit explicitly:
          // natural ordering calls null smallest, so compare(rOn, null)
          // > 0 would otherwise satisfy the >= 0 advance for EVERY
          // right row and attach the key's minimum-on row.
          if (forward && lOn.isNullAt(0))
            return outProj(joined(lRow, nullRight))
          // advance the right side through every row at-or-before this
          // left row in (key, on) order; remember the last same-key row.
          // The copy per retained row is unavoidable: sort iterators reuse
          // one UnsafeRow buffer, so any row held across a peek dies.
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val kc = keyOrd.compare(rKeyProj(rRow), lKey)
            if (kc < 0) {
              rBuf.next() // earlier key: discard (its key can't come back)
            } else if (kc == 0 && rOnProj(rRow).isNullAt(0)) {
              // a null right `on` can never match ANY left row (SQL
              // comparison semantics; DuckDB ASOF and merge_asof agree)
              // — consume without retaining. Natural ordering would
              // otherwise call null smallest and retain it in the
              // backward advance below.
              rBuf.next()
              ()
            } else if (kc == 0 && {
              val c = onOrd.compare(rOnProj(rRow), lOn)
              if (forward) c >= 0 else c <= 0
            }) {
              lastRight = rBuf.next().copy()
            } else {
              advancing = false // right side is past this left row
            }
          }
          val matched =
            if (lastRight == null) nullRight
            else if (toleranceUs >= 0L && {
              val delta = math.abs(onMicros(lOn) - onMicros(rOnProj(lastRight)))
              delta > toleranceUs
            }) nullRight // retained row exists but lies outside the window
            else lastRight
          outProj(joined(lRow, matched))
        }
      }
    }
  }

  /** Physical long value of an `on` cell for the tolerance check:
    * TimestampType stores epoch micros, integral types their value.
    * Restricting tolerance to these types is enforced at build time.
    */
  private def onMicros(row: InternalRow): Long = leftOn.dataType match {
    case org.apache.spark.sql.types.IntegerType => row.getInt(0).toLong
    case _ => row.getLong(0) // TimestampType (micros) / LongType
  }

  protected override def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Build the as-of join DataFrame through the custom operator. The
    * strategy self-registers on the session's `experimental.extraStrategies`
    * (idempotent); the right side is re-projected through fresh aliases so
    * self-join shapes (both sides off one scan) carry distinct attribute
    * ids.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      on: String,
      rightValueCols: Seq[String]): DataFrame =
    build(left, right, by, on, rightValueCols, forward = false)

  /** Backward as-of with a TOLERANCE (pandas `merge_asof(tolerance=…)`):
    * the usual latest-at-or-before match, nulled out when it lies more
    * than `toleranceUs` behind the left row — "the last quote, but only
    * if it is fresh enough". The `on` column must be a timestamp
    * (micros) or integral type; the check is one subtraction at emit
    * time on the already-retained row, so the merge stays O(1)-state.
    */
  def backwardTolerance(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      on: String,
      rightValueCols: Seq[String],
      toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0L, s"tolerance must be >= 0, got $toleranceUs")
    build(left, right, by, on, rightValueCols, forward = false,
      toleranceUs = toleranceUs)
  }

  /** Forward as-of: for every left row, the EARLIEST right row with
    * `rightOn >= leftOn` in the same `by` key (DuckDB `ASOF ... ON
    * l.on <= r.on`, pandas `merge_asof(direction="forward")`) — the
    * next-event attachment (next purchase after a click, next restock
    * after a stock-out). Same exec, `on` ordering flipped to descending;
    * right rows with a null `on` never match (they sort last and are
    * never at-or-after anything).
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      on: String,
      rightValueCols: Seq[String]): DataFrame =
    build(left, right, by, on, rightValueCols, forward = true)

  private def build(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      on: String,
      rightValueCols: Seq[String],
      forward: Boolean,
      toleranceUs: Long = -1L): DataFrame = {
    val spark: SparkSession = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

    import org.apache.spark.sql.functions.col
    val rFresh = right.select(
      (by ++ Seq(on) ++ rightValueCols).distinct.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rFresh.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"as-of join: column '$name' not found in ${plan.output.map(_.name)}"))
    val plan = AsOfJoinPlan(
      lPlan, rPlan,
      leftBy = by.map(attr(lPlan, _)),
      rightBy = by.map(attr(rPlan, _)),
      leftOn = attr(lPlan, on),
      rightOn = attr(rPlan, on),
      rightValues = rightValueCols.map(attr(rPlan, _)),
      forward = forward,
      toleranceUs = toleranceUs)
    // The exec compares BOTH sides' `by`/`on` cells with orderings (and,
    // under tolerance, a physical long read) keyed on the LEFT attribute
    // types — a type mismatch would silently misread the right cells
    // (getInt on a long slot), not error. Reject loudly for every
    // direction, not just tolerance.
    (by :+ on).foreach { c =>
      val (ldt, rdt) = (attr(lPlan, c).dataType, attr(rPlan, c).dataType)
      require(ldt == rdt,
        s"as-of join: column '$c' must have the same type on both sides, " +
          s"got left=$ldt right=$rdt (cast one side before joining)")
    }
    if (toleranceUs >= 0L) {
      val dt = attr(lPlan, on).dataType
      require(dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType,
        s"as-of tolerance requires a timestamp or integral `on` column, got $dt")
    }
    ColumnBridge.ofRows(spark, plan)
  }
}
