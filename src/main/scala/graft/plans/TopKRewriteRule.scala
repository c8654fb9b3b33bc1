package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous per-group top-k idiom
  *
  *   df.withColumn("rn", row_number().over(Window.partitionBy(g).orderBy(o)))
  *     .filter($"rn" <= k)
  *     .select(<columns not including rn>)
  *
  * into the bounded-heap [[TopKPerGroup]] operator — same rows, no
  * full partition sort. Fires ONLY when every condition is provably
  * safe:
  *   - the Window computes exactly one expression: a row_number() alias;
  *   - the filter is `rn <= lit` / `rn < lit` / `lit >= rn` / `lit > rn`
  *     directly above the Window;
  *   - the Project above discards the rank attribute (if the user keeps
  *     the rank, the window formulation is required).
  *
  * Registered through GraftExtensions.injectOptimizerRule, paired with
  * [[TopKStrategy]] to plan the rewritten node.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  // compute in Long: `rn < Int.MinValue` must yield 0 (empty result),
  // not wrap to Int.MaxValue and pass the `> 0` guard
  private def rankLimit(cond: Expression, rn: Attribute): Option[Long] =
    cond match {
      case LessThanOrEqual(r: Attribute, IntegerLiteral(k)) if r.semanticEquals(rn) => Some(k.toLong)
      case LessThan(r: Attribute, IntegerLiteral(k)) if r.semanticEquals(rn) => Some(k.toLong - 1)
      case GreaterThanOrEqual(IntegerLiteral(k), r: Attribute) if r.semanticEquals(rn) => Some(k.toLong)
      case GreaterThan(IntegerLiteral(k), r: Attribute) if r.semanticEquals(rn) => Some(k.toLong - 1)
      case _ => None
    }

  // TopKPerGroupExec groups by raw UnsafeRow key bytes, so -0.0 vs 0.0
  // (and distinct NaN bit patterns) would split into separate groups
  // where the window operator's normalized keys treat them as one.
  // Bail on any floating-point content in the partition keys.
  private def hasFloatingPoint(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case FloatType | DoubleType => true
      case ArrayType(et, _) => hasFloatingPoint(et)
      case MapType(kt, vt, _) => hasFloatingPoint(kt) || hasFloatingPoint(vt)
      case StructType(fields) => fields.exists(f => hasFloatingPoint(f.dataType))
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(Alias(WindowExpression(_: RowNumber,
              WindowSpecDefinition(partitionSpec, orderSpec, _)), _)),
            _, _, winChild, _)))
        // the Window node's own output = child ++ [rn]; grab rn
        if {
          val rnAttr = p.child.asInstanceOf[Filter].child.output.last
          rankLimit(cond, rnAttr).exists(k => k > 0 && k <= Int.MaxValue) &&
          projectList.forall(e =>
            e.references.isEmpty || !e.references.contains(rnAttr)) &&
          partitionSpec.nonEmpty &&
          !partitionSpec.exists(e => hasFloatingPoint(e.dataType))
        } =>
      val rnAttr = p.child.asInstanceOf[Filter].child.output.last
      val k = rankLimit(cond, rnAttr).get.toInt
      // Spark's own InferWindowGroupLimit may already have inserted a
      // WindowGroupLimit below the Window (rule-order dependent) —
      // TopKPerGroup subsumes it, so strip it to avoid double limiting.
      // Only strip when its limit is at least k: a tighter limit (none
      // exists today, but rule evolution could add one) must stay, or
      // stripping would widen the result.
      val source = winChild match {
        case WindowGroupLimit(ps, os, _, l, c)
            if ps == partitionSpec && os == orderSpec && l >= k => c
        case other => other
      }
      Project(projectList, TopKPerGroup(partitionSpec, orderSpec, k, source))
  }
}

private object IntegerLiteral {
  def unapply(e: Expression): Option[Int] = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => Some(v)
    case Cast(Literal(v: Int, org.apache.spark.sql.types.IntegerType), _, _, _) => Some(v)
    case _ => None
  }
}
