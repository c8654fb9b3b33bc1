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

  private def rankLimit(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(r: Attribute, IntegerLiteral(k)) if r.semanticEquals(rn) => Some(k)
      case LessThan(r: Attribute, IntegerLiteral(k)) if r.semanticEquals(rn) => Some(k - 1)
      case GreaterThanOrEqual(IntegerLiteral(k), r: Attribute) if r.semanticEquals(rn) => Some(k)
      case GreaterThan(IntegerLiteral(k), r: Attribute) if r.semanticEquals(rn) => Some(k - 1)
      case _ => None
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
          rankLimit(cond, rnAttr).exists(_ > 0) &&
          projectList.forall(e =>
            e.references.isEmpty || !e.references.contains(rnAttr)) &&
          partitionSpec.nonEmpty
        } =>
      val rnAttr = p.child.asInstanceOf[Filter].child.output.last
      val k = rankLimit(cond, rnAttr).get
      // Spark's own InferWindowGroupLimit may already have inserted a
      // WindowGroupLimit below the Window (rule-order dependent) —
      // TopKPerGroup subsumes it, so strip it to avoid double limiting
      val source = winChild match {
        case WindowGroupLimit(ps, os, _, _, c)
            if ps == partitionSpec && os == orderSpec => c
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
