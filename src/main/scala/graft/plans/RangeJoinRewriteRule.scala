package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite the naive absolute-difference range join
  *
  *   a.join(b, abs(a.ts - b.ts) <= w)          // no shared equi key
  *
  * — which Spark can only plan as a BroadcastNestedLoopJoin (O(n·m)
  * comparisons, undistributable when neither side broadcasts) — into
  * the bin-and-probe equi-join `q_range_join` hand-writes: quantize
  * both sides by `bin = value div w`, explode the smaller side into
  * {bin-1, bin, bin+1}, equi-join on the bin, keep the original
  * predicate as the exact verify. Any pair within `w` lands in
  * adjacent bins (each bin spans >= w), and each qualifying pair
  * matches exactly ONE exploded row (the three bins are distinct), so
  * the rewrite is lossless with a fixed 3x fan-out of the smaller
  * side — the O(n·m) theta join becomes a shuffled hash join on
  * uniform integer keys.
  *
  * Truncating `div` (IntegralDivide — exact integer arithmetic, no
  * double-rounding hazard at large magnitudes) keeps bin adjacency
  * for NEGATIVE values too: div buckets have width w everywhere except
  * the zero bucket (-w, w), which is wider, and a monotone bucketing
  * with bucket width >= w maps any interval of length <= w into at
  * most two adjacent buckets. `RangeJoinRuleSpec` property-tests this
  * across sign boundaries.
  *
  * Fires ONLY when every condition is provably safe:
  *   - INNER join, deterministic condition;
  *   - some conjunct is `abs(x - y) <= lit` / `< lit` (or reversed),
  *     with x and y integral, one referencing only the left side and
  *     the other only the right, and lit >= 1;
  *   - NO equi conjunct already joins the two sides (if one exists the
  *     planner already has a hash join — and this guard is also what
  *     stops the rule re-firing on its own output).
  *
  * Registered through GraftExtensions.injectOptimizerRule (deployment)
  * or [[RangeJoinRewriteRule.enable]] (per-session, idempotent).
  *
  * Boundary: neighbor bins are bin±1 in long arithmetic, so values
  * within `w` of Long.MinValue/MaxValue could overflow the bin
  * computation (under ANSI mode, a runtime error the naive plan would
  * not raise). Timestamps and any physical measure sit far inside
  * that range; the property sweep exercises ±1e12.
  *
  * Narrow-type boundary (Int/Short/Byte operands): bins are computed
  * in LONG arithmetic (asLong casts first), so the bin computation
  * itself never wraps — but the ORIGINAL predicate, which the rewrite
  * keeps as the verify, subtracts in the narrow type. Under non-ANSI
  * semantics a pair whose true difference exceeds the type range wraps
  * (e.g. Int x=MaxValue, y=-1: x-y wraps to MinValue, whose abs is
  * itself negative, so abs(x-y) <= w holds spuriously); the naive plan
  * emits that pair but the binned plan never co-locates it (its TRUE
  * bins are ~2^31/w apart), so the rewrite is not result-identical at
  * the extreme edge of a narrow type's range. Under ANSI mode (the
  * Spark 4 default) the same pair makes the naive plan raise instead,
  * and the rewritten plan may not (the subtraction is only evaluated
  * for bin-adjacent pairs) — error vs silence, not wrong rows. Both
  * divergences need |x - y| >= type_max, i.e. operands at opposite
  * extremes of the full narrow-type range; like the Long note above,
  * real measures (ids, timestamps, prices) sit far inside it.
  */
object RangeJoinRewriteRule extends Rule[LogicalPlan] {

  /** Idempotent per-session registration (the programmatic-API path,
    * mirroring TopKPerGroup's strategy registration). */
  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private object PosLongLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) if v >= 1 => Some(v)
      case Literal(v: Int, IntegerType) if v >= 1 => Some(v.toLong)
      case _ => None
    }
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case IntegerType | LongType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.ByteType => true
    case _ => false
  }

  /** (x, y, w) from `abs(x - y) <= w` and variants. `<` keeps the same
    * bin width — strictly tighter than `<=`, still lossless. */
  private def rangePred(c: Expression): Option[(Expression, Expression, Long)] =
    c match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), PosLongLiteral(w)) =>
        Some((x, y, w))
      case LessThan(Abs(Subtract(x, y, _), _), PosLongLiteral(w)) =>
        Some((x, y, w))
      case GreaterThanOrEqual(PosLongLiteral(w), Abs(Subtract(x, y, _), _)) =>
        Some((x, y, w))
      case GreaterThan(PosLongLiteral(w), Abs(Subtract(x, y, _), _)) =>
        Some((x, y, w))
      case _ => None
    }

  private def onlyRefs(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def hasEquiConjunct(cs: Seq[Expression], left: LogicalPlan,
                              right: LogicalPlan): Boolean =
    cs.exists {
      case EqualTo(l, r) =>
        (onlyRefs(l, left) && onlyRefs(r, right)) ||
        (onlyRefs(l, right) && onlyRefs(r, left))
      case EqualNullSafe(l, r) =>
        (onlyRefs(l, left) && onlyRefs(r, right)) ||
        (onlyRefs(l, right) && onlyRefs(r, left))
      case _ => false
    }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _)
        if cond.deterministic && !j.isStreaming => {
      val cs = conjuncts(cond)
      val hit = if (hasEquiConjunct(cs, left, right)) None
      else cs.iterator.flatMap(rangePred(_).iterator).collectFirst {
        // orient: lx on the left side, ry on the right
        case (x, y, w)
            if integral(x) && integral(y) &&
              onlyRefs(x, left) && onlyRefs(y, right) => (x, y, w)
        case (x, y, w)
            if integral(x) && integral(y) &&
              onlyRefs(y, left) && onlyRefs(x, right) => (y, x, w)
      }
      hit match {
        case None => j
        case Some((lx, ry, w)) =>
          val wLit = Literal(w, LongType)
          val one = Literal(1L, LongType)
          val lBin = new IntegralDivide(asLong(lx), wLit)
          val rBin = new IntegralDivide(asLong(ry), wLit)
          // explode the (estimated) smaller side into its 3 bins; the
          // bigger side computes its single bin in a projection
          val explodeLeft =
            try left.stats.sizeInBytes <= right.stats.sizeInBytes
            catch { case _: Throwable => true }
          val binAttr = AttributeReference("__range_bin", LongType)()
          def exploded(side: LogicalPlan, bin: Expression): LogicalPlan =
            Generate(
              Explode(CreateArray(Seq(
                Subtract(bin, one), bin, Add(bin, one)))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binAttr), child = side)
          def projected(side: LogicalPlan, bin: Expression): (LogicalPlan, Attribute) = {
            val a = Alias(bin, "__range_bin_p")()
            (Project(side.output :+ a, side), a.toAttribute)
          }
          val (newLeft, newRight, lKey, rKey) =
            if (explodeLeft) {
              val (r, rk) = projected(right, rBin)
              (exploded(left, lBin), r, binAttr: Attribute, rk)
            } else {
              val (l, lk) = projected(left, lBin)
              (l, exploded(right, rBin), lk, binAttr: Attribute)
            }
          // equi key first; the full original condition re-verifies
          // exactly (the range conjunct included). The original join's
          // hint (e.g. a user broadcast) survives the rewrite.
          val newCond = And(EqualTo(lKey, rKey), cond)
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), j.hint))
      }
    }
  }
}
