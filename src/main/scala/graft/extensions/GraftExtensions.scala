package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, IntegerType, LongType, ShortType}
import graft.expressions.CosineSim

/** Catalyst extension (capability class (c) of the build brief): an
  * optimizer `Rule` registered through `SparkSessionExtensions` that turns
  * declarative similarity θ-joins into LSH-bucketed equi-joins.
  *
  * A user writing
  * {{{ a.crossJoin(b).filter(cosine_sim($"va", $"vb") >= 0.9) }}}
  * gets a quadratic nested-loop plan — and NO amount of operator
  * composition on our side fixes a query the user already wrote. This is
  * the case where extending the optimizer is genuinely required: the rule
  * recognizes the shape `Filter(CosineSim(a, b) >= τ, Join(l, r))` with
  * sides-separable vector expressions and rewrites it to
  * {{{ Join(l+bucket(a), r+bucket(b), bucketL = bucketR) + original filter }}}
  * so the pair space shrinks from |L|·|R| to Σ per-bucket products, and the
  * join becomes hash-partitionable.
  *
  * The rewrite is APPROXIMATE (hyperplane LSH recall < 1 for τ < 1), so it
  * is opt-in: set `spark.graft.lsh.rewrite.enabled=true`. Planes per bucket
  * come from `spark.graft.lsh.rewrite.planes` (default 8).
  */
case class HyperplaneBucketDyn(child: Expression, nPlanes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  private lazy val vf = graft.expressions.ExprHelpers.isFloatArray(child)
  override def nullSafeEval(v: Any): Any =
    graft.expressions.VectorKernels.hyperplaneBucketDyn(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], nPlanes, seed, vf)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.VectorKernels.hyperplaneBucketDyn($v, $nPlanes, ${seed}L, $vf)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RewriteSimilarityJoin extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.lsh.rewrite.enabled", "false").toBoolean
  private def nPlanes: Int =
    conf.getConfString("spark.graft.lsh.rewrite.planes", "8").toInt

  private object SimilarityTheta {
    /** Extract (condition, leftVec, rightVec, l, r) from either shape the
      * optimizer may present: Filter-above-Join, or the filter already
      * pushed into the join condition.
      */
    def unapply(plan: LogicalPlan): Option[(Expression, Expression, Expression, LogicalPlan, LogicalPlan)] =
      plan match {
        case Filter(cond @ GreaterThanOrEqual(CosineSim(a, b), Literal(_, DoubleType)),
              Join(l, r, Inner | Cross, None, _)) =>
          orient(cond, a, b, l, r)
        case Join(l, r, Inner | Cross,
              Some(cond @ GreaterThanOrEqual(CosineSim(a, b), Literal(_, DoubleType))), _) =>
          orient(cond, a, b, l, r)
        case _ => None
      }

    private def orient(
        cond: Expression, a: Expression, b: Expression,
        l: LogicalPlan, r: LogicalPlan) =
      if (a.deterministic && b.deterministic &&
        a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet))
        Some((cond, a, b, l, r))
      else if (a.deterministic && b.deterministic &&
        b.references.subsetOf(l.outputSet) && a.references.subsetOf(r.outputSet))
        Some((cond, b, a, l, r))
      else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case SimilarityTheta(cond, leftVec, rightVec, l, r) =>
        rewrite(cond, leftVec, rightVec, l, r)
    }
  }

  private def rewrite(
      cond: Expression,
      leftVec: Expression,
      rightVec: Expression,
      l: LogicalPlan,
      r: LogicalPlan): LogicalPlan = {
    val lBucket = Alias(HyperplaneBucketDyn(leftVec, nPlanes, 42L), "__lsh_bucket_l")()
    val rBucket = Alias(HyperplaneBucketDyn(rightVec, nPlanes, 42L), "__lsh_bucket_r")()
    val lp = Project(l.output :+ lBucket, l)
    val rp = Project(r.output :+ rBucket, r)
    val bucketJoin = Join(lp, rp, Inner,
      Some(EqualTo(lBucket.toAttribute, rBucket.toAttribute)), JoinHint.NONE)
    logInfo(s"graft: rewrote similarity theta-join to LSH bucket equi-join ($nPlanes planes)")
    Project(l.output ++ r.output, Filter(cond, bucketJoin))
  }
}

/** LOSSLESS band-join rewrite: a user writing
  * {{{ a.crossJoin(b).filter(abs($"x" - $"y") <= w) }}}
  * gets a CartesianProduct / BroadcastNestedLoopJoin — quadratic, the
  * classic scale killer of proximity joins (timestamps within a
  * tolerance, positions within a window). The rule recognizes the band
  * conjunct `abs(x − y) ≤ w` with side-separable int-width operands and
  * a non-negative integer literal width, and rewrites to a BUCKETED
  * EQUI-JOIN: the left side computes floor(x/width); the right side
  * EXPLODES to its three adjacent buckets {floor(y/width)−1, …, +1}.
  * The pigeonhole is exact — |x − y| ≤ width forces floor(x/width)
  * into that 3-window — and because the left bucket is single-valued
  * while the right's three are distinct, every qualifying pair joins
  * EXACTLY once: multiset semantics survive with no dedup step. The
  * ORIGINAL condition is re-applied above the join, so the rewrite can
  * only remove non-candidates, never change results — unlike the LSH
  * rule this one is exact, and is therefore enabled by default
  * (`spark.graft.band.rewrite.enabled=false` to opt out).
  *
  * Scope guards: operands must be byte/short always, or int under ANSI
  * mode (see [[RewriteBandJoin.intWidth]] for the overflow analysis —
  * a 64-bit or non-ANSI-int subtraction can wrap where the Long bucket
  * math cannot, and the two would disagree), deterministic, and one
  * per join side; joins already carrying an equi-key are left alone.
  * Null operands fall out identically on both paths (null bucket never
  * equi-joins; null band conjunct never passes the filter).
  */
object RewriteBandJoin extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.band.rewrite.enabled", "true").toBoolean

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case x => Seq(x)
  }

  private def widthOf(e: Expression): Option[Long] = e match {
    case Literal(v: Byte, ByteType)      => Some(v.toLong)
    case Literal(v: Short, ShortType)    => Some(v.toLong)
    case Literal(v: Int, IntegerType)    => Some(v.toLong)
    case Literal(v: Long, LongType)      => Some(v)
    case _ => None
  }

  /** Operand admission. Byte/short operands can never overflow their
    * int-typed subtraction, so the rewrite is unconditionally exact.
    * Int operands CAN overflow `x − y` at extreme spans: under ANSI
    * (the default) the exact plan would THROW on such a pair while the
    * bucket join prunes it first — acceptable, the same best-effort
    * error semantics Spark's own pruning/pushdown already has — but
    * under non-ANSI the wrapped difference can spuriously satisfy the
    * band and the pruned rewrite would silently drop that pair, so int
    * operands are only admitted when ANSI is on.
    */
  private def intWidth(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType => true
    case IntegerType =>
      conf.getConf(org.apache.spark.sql.internal.SQLConf.ANSI_ENABLED)
    case _ => false
  }

  /** The band conjunct in any of its comparison spellings. `< w` and
    * `> w` reuse the `≤ w` buckets — a strictly-tighter predicate is a
    * subset, and the original condition re-filters exactly.
    */
  private def bandOf(c: Expression): Option[(Expression, Expression, Long)] =
    c match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), lim) =>
        widthOf(lim).map(w => (x, y, w))
      case LessThan(Abs(Subtract(x, y, _), _), lim) =>
        widthOf(lim).map(w => (x, y, w))
      case GreaterThanOrEqual(lim, Abs(Subtract(x, y, _), _)) =>
        widthOf(lim).map(w => (x, y, w))
      case GreaterThan(lim, Abs(Subtract(x, y, _), _)) =>
        widthOf(lim).map(w => (x, y, w))
      case _ => None
    }

  private def orient(
      x: Expression, y: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression)] =
    if (x.deterministic && y.deterministic && intWidth(x) && intWidth(y) &&
      x.references.nonEmpty && y.references.nonEmpty &&
      x.references.subsetOf(l.outputSet) && y.references.subsetOf(r.outputSet))
      Some((x, y))
    else if (x.deterministic && y.deterministic && intWidth(x) && intWidth(y) &&
      x.references.nonEmpty && y.references.nonEmpty &&
      y.references.subsetOf(l.outputSet) && x.references.subsetOf(r.outputSet))
      Some((y, x))
    else None

  private object BandTheta {
    def unapply(plan: LogicalPlan)
        : Option[(Expression, Expression, Expression, Long, LogicalPlan, LogicalPlan)] =
      plan match {
        case Filter(cond, Join(l, r, Inner | Cross, None, _)) =>
          find(cond, l, r)
        case Join(l, r, Inner | Cross, Some(cond), _) =>
          find(cond, l, r)
        case _ => None
      }

    /** An equality conjunct with one side per join side — the plan is
      * already hash-partitionable on it, so adding bucket keys could only
      * narrow the join's selectivity, not fix a quadratic plan: skip.
      */
    private def hasEquiKey(cond: Expression, l: LogicalPlan, r: LogicalPlan) =
      splitConjuncts(cond).exists {
        case EqualTo(x, y) =>
          (x.references.nonEmpty && y.references.nonEmpty &&
            ((x.references.subsetOf(l.outputSet) && y.references.subsetOf(r.outputSet)) ||
              (y.references.subsetOf(l.outputSet) && x.references.subsetOf(r.outputSet))))
        case _ => false
      }

    private def find(cond: Expression, l: LogicalPlan, r: LogicalPlan) =
      // bucket columns already present ⇒ this IS our rewrite output
      // (a later pushdown can merge the re-filter into the bucket join,
      // which would otherwise re-match at the optimizer's fixpoint)
      if ((l.output ++ r.output).exists(_.name.startsWith("__band_bucket")) ||
        hasEquiKey(cond, l, r))
        None
      else splitConjuncts(cond).iterator.flatMap { c =>
        bandOf(c).flatMap {
          case (x, y, w) if w >= 0 =>
            orient(x, y, l, r).map { case (lx, ry) => (cond, lx, ry, w, l, r) }
          case _ => None
        }
      }.nextOption()
  }

  // floor(v / width) in Long: truncating div is exact on the pmod-
  // cleared numerator, so negatives floor correctly
  private def floorBucket(v: Expression, width: Long): Expression = {
    val vl = Cast(v, LongType)
    val wl = Literal(width, LongType)
    IntegralDivide(Subtract(vl, Pmod(vl, wl)), wl)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case BandTheta(cond, lx, ry, w, l, r) =>
        val width = math.max(w, 1L)
        val lBucket = Alias(floorBucket(lx, width), "__band_bucket_l")()
        val rBucket = Alias(floorBucket(ry, width), "__band_bucket_r")()
        val lp = Project(l.output :+ lBucket, l)
        val rp = Project(r.output :+ rBucket, r)
        val gOut = AttributeReference("__band_bucket_g", LongType)()
        val one = Literal(1L, LongType)
        val gen = Generate(
          Explode(CreateArray(Seq(
            Subtract(rBucket.toAttribute, one),
            rBucket.toAttribute,
            Add(rBucket.toAttribute, one)))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(gOut), child = rp)
        val bucketJoin = Join(lp, gen, Inner,
          Some(EqualTo(lBucket.toAttribute, gOut)), JoinHint.NONE)
        logInfo(s"graft: rewrote band theta-join (|x-y| <= $w) to bucketed equi-join")
        Project(l.output ++ r.output, Filter(cond, bucketJoin))
    }
  }
}

/** Register with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.extensions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteSimilarityJoin)
    e.injectOptimizerRule(_ => RewriteBandJoin)
    // the custom as-of join operator's planning strategy (graft.plans):
    // sessions built with the extension plan AsOfJoinPlan without the
    // per-call experimental.extraStrategies registration
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ()
  }
}
