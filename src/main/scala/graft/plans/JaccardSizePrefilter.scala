package graft.plans

import graft.functions.JaccardSorted
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Injected optimizer rule: a filter `jaccard_sorted(a, b) >= t` (possibly
  * under `round(·, s)`) implies the set sizes are within a factor of t —
  * |A∩B| ≤ min, |A∪B| ≥ max, so J ≤ min/max. The rule conjoins the cheap
  * size-ratio bounds so candidate pairs are pruned by two `size()` reads
  * BEFORE the O(|A|+|B|) merge runs. The bound is relaxed by the rounding
  * margin, so it can never drop a qualifying pair.
  *
  * Registered through `spark.experimental.extraOptimizations` (the
  * runtime twin of `SparkSessionExtensions.injectOptimizerRule`).
  */
object JaccardSizePrefilter extends Rule[LogicalPlan] {

  private def jaccardThreshold(e: Expression): Option[(JaccardSorted, Double)] = e match {
    case GreaterThanOrEqual(j: JaccardSorted, Literal(t: Double, DoubleType)) => Some((j, t))
    case GreaterThanOrEqual(r, Literal(t: Double, DoubleType))
        if r.children.nonEmpty && r.children.head.isInstanceOf[JaccardSorted] &&
          r.prettyName == "round" =>
      Some((r.children.head.asInstanceOf[JaccardSorted], t))
    case _ => None
  }

  private def sizeBound(x: Expression, y: Expression, t: Double): Expression =
    GreaterThanOrEqual(Cast(Size(x), DoubleType),
      Multiply(Cast(Size(y), DoubleType), Literal(t)))

  private def bounds(cond: Expression): Option[Expression] = {
    val found = cond.collect { case e if jaccardThreshold(e).isDefined =>
      jaccardThreshold(e).get
    }
    found.headOption.collect { case (j, t) if t > 0.0 =>
      val ts = t - 0.001 // relax past the round(·, 4) margin — sound
      And(sizeBound(j.left, j.right, ts), sizeBound(j.right, j.left, ts))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // predicate pushdown may have run first, leaving the jaccard threshold
    // either in a Filter or folded into a Join condition — handle both
    case f @ Filter(cond, child) if !alreadyRewritten(cond) =>
      bounds(cond).map(b => Filter(And(b, cond), child)).getOrElse(f)
    case jn @ Join(_, _, _, Some(cond), _) if !alreadyRewritten(cond) =>
      bounds(cond).map(b => jn.copy(condition = Some(And(b, cond)))).getOrElse(jn)
  }

  private def alreadyRewritten(cond: Expression): Boolean =
    cond.exists {
      case GreaterThanOrEqual(Cast(Size(_: Expression, _), DoubleType, _, _), _) => true
      case _ => false
    }
}
