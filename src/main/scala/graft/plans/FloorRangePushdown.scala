package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Injected optimizer rule: a filter `floor(key / c) = k` (the "fetch one
  * OID page" shape, download_rest.py's per-page request) is opaque to the
  * parquet reader — only `IsNotNull` reaches the scan, so every page
  * lookup reads the whole table. For an integral key and an integral
  * page size c > 0, `floor(key / c) = k  ⟺  k·c ≤ key < (k+1)·c`, so the
  * rule CONJOINS the equivalent range predicates; Catalyst then pushes
  * them into `PushedFilters`, and on range-partitioned layouts they prune
  * entire row groups/partitions. The original predicate is kept (conjoin,
  * never replace), so the rewrite can only tighten the scan.
  *
  * Soundness window: keys up to 2^52 — `key / c` is evaluated in doubles,
  * exact for integral values below the 53-bit mantissa (beyond that the
  * rule abstains; bounds are also overflow-checked in Math.multiplyHigh
  * terms before being emitted).
  */
object FloorRangePushdown extends Rule[LogicalPlan] {

  /** Unwrap WIDENING casts down to the underlying integral attribute.
    * A narrowing cast (e.g. long → int with ANSI off) wraps values, so
    * the range implication would not hold — abstain on anything but an
    * up-cast to long/double. */
  private def integralAttr(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference if a.dataType == LongType || a.dataType == IntegerType => Some(a)
    case Cast(child, dt, _, _)
        if dt == org.apache.spark.sql.types.DoubleType || dt == LongType =>
      integralAttr(child)
    case _ => None
  }

  /** Foldable integral-valued literal (possibly under a cast). */
  private def integralConst(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType)   => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Double, _) if v.isWhole => Some(v.toLong)
    case Cast(child, _, _, _) if e.foldable => integralConst(child)
    case _ => None
  }

  private def pageEquality(e: Expression): Option[(AttributeReference, Long, Long)] = {
    def floorDiv(x: Expression): Option[(AttributeReference, Long)] = x match {
      case Floor(Divide(num, den, _)) =>
        for {
          a <- integralAttr(num)
          c <- integralConst(den) if c > 0
        } yield (a, c)
      case Cast(child, _, _, _) => floorDiv(child)
      case _ => None
    }
    e match {
      case EqualTo(l, r) =>
        floorDiv(l).flatMap { case (a, c) => integralConst(r).map(k => (a, c, k)) }
          .orElse(floorDiv(r).flatMap { case (a, c) => integralConst(l).map(k => (a, c, k)) })
      case _ => None
    }
  }

  private def rangeFor(a: AttributeReference, c: Long, k: Long): Option[Expression] = {
    // abstain outside the double-exact window, on multiply overflow, or
    // when a bound does not FIT the key's type (an int-truncated bound
    // wraps negative and would wrongly exclude rows near Int.MaxValue)
    val lo = k * c
    val hi = (k + 1) * c
    val fitsType = a.dataType == LongType ||
      (lo >= Int.MinValue.toLong && hi <= Int.MaxValue.toLong)
    val safe = math.abs(k) < (1L << 52) / math.max(c, 1L) && lo < hi &&
      math.abs(hi) < (1L << 52) && fitsType
    if (!safe) None
    else {
      def lit(v: Long): Expression =
        if (a.dataType == LongType) Literal(v) else Literal(v.toInt)
      Some(And(GreaterThanOrEqual(a, lit(lo)), LessThan(a, lit(hi))))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if !alreadyRewritten(cond) =>
      // ONLY top-level conjuncts: a page equality under OR/NOT does not
      // imply the range for the whole filter, so it must not be rewritten
      // (e.g. `floor(k/c)=7 || flag` admits rows outside page 7)
      val extras = splitAnd(cond)
        .flatMap(e => pageEquality(e))
        .flatMap { case (a, c, k) => rangeFor(a, c, k) }
      if (extras.isEmpty) f
      else Filter(And(extras.reduce(And), cond), child)
  }

  // the rule batch runs to fixpoint — adding bounds that are already
  // present must be a no-op
  private def alreadyRewritten(cond: Expression): Boolean = {
    val conjuncts = splitAnd(cond)
    conjuncts.flatMap(e => pageEquality(e)).exists { case (a, c, k) =>
      rangeFor(a, c, k).exists { r =>
        splitAnd(r).forall(b => conjuncts.exists(_.semanticEquals(b)))
      }
    }
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other     => Seq(other)
  }
}
