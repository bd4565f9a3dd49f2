package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
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

/** Register with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.extensions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteSimilarityJoin)
    // the custom as-of join operator's planning strategy (graft.plans):
    // sessions built with the extension plan AsOfJoinPlan without the
    // per-call experimental.extraStrategies registration
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ()
  }
}
