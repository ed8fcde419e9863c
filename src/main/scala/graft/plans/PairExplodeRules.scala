package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.functions.PairExplode

/** Optimizer rule (SURVEY.md §4 item 2, the "optional later" piece): push a
  * distance predicate into the [[graft.functions.PairExplode]] generator.
  *
  * A query like
  *   SELECT ... FROM t LATERAL VIEW explode_pairs(ms, 50) WHERE abs(s_ind - t_ind) <= 5
  * generates every pair within 50 and then discards 90% of them. This rule
  * rewrites the generator's bound to the filter's tighter constant, so the
  * out-of-bound pairs are never MATERIALIZED at all (for a sentence with m
  * mentions the generator does O(m²) index checks either way, but emission —
  * the expensive part: 6 fields, struct allocation, downstream operators — is
  * cut to the true bound).
  *
  * The residual Filter is left in place (its distance conjunct becomes
  * trivially true): correctness never depends on the rewrite, only row volume
  * does. Matches `abs(s_ind - t_ind) <= k`, `abs(t_ind - s_ind) < k`, and the
  * flipped `k >= abs(...)` forms over THIS generator's first two output
  * attributes, with integer-literal bounds.
  */
object PushDistanceFilterIntoPairExplode extends Rule[LogicalPlan] {

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
    case _ => None
  }

  /** The `<= k` bound implied by one conjunct over (sInd, tInd), if any. */
  private def boundOf(c: Expression, sInd: Attribute, tInd: Attribute): Option[Int] = {
    def isPair(a: Expression, b: Expression): Boolean = (a, b) match {
      case (x: AttributeReference, y: AttributeReference) =>
        Set(x.exprId, y.exprId) == Set(sInd.exprId, tInd.exprId)
      case _ => false
    }
    def isAbsDist(e: Expression): Boolean = e match {
      case Abs(Subtract(a, b, _), _) => isPair(a, b)
      case _ => false
    }
    c match {
      case LessThanOrEqual(l, r) if isAbsDist(l) => intLit(r)
      case LessThan(l, r) if isAbsDist(l)        => intLit(r).map(_ - 1)
      case GreaterThanOrEqual(l, r) if isAbsDist(r) => intLit(l)
      case GreaterThan(l, r) if isAbsDist(r)        => intLit(l).map(_ - 1)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, g @ Generate(pe: PairExplode, _, _, _, out, _))
        if out.length >= 2 =>
      val tight = for {
        cur <- intLit(pe.bound)
        k <- splitConjunctivePredicates(cond)
          .flatMap(boundOf(_, out.head, out(1))).minOption
        if k < cur
      } yield f.copy(child = g.copy(generator = pe.copy(bound = Literal(math.max(k, 0)))))
      tight.getOrElse(f)
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other     => Seq(other)
    }
}

object GraftOptimizations {
  /** Enable the engine's optimizer rules on a live session (also usable at
    * config time via spark.sql.extensions -> [[GraftExtensions]]). */
  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(PushDistanceFilterIntoPairExplode))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushDistanceFilterIntoPairExplode
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` registration point. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => PushDistanceFilterIntoPairExplode)
}
