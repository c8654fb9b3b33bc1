package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{CosineSimilarity, DotLong, MisraGriesAgg, NGramsGen, NfcNormalize, SimHash64Agg}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the engine's custom
  * Catalyst functions available in ANY session created with
  *   spark.sql.extensions=graft.GraftExtensions
  * (or .withExtensions(new GraftExtensions)) — the deployment-grade
  * registration path, vs. the per-session FunctionRegistry call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotLong].getName, "dot_long"),
      (exprs: Seq[Expression]) => DotLong(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Agg].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64Agg(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      (exprs: Seq[Expression]) => MisraGriesAgg(exprs(0),
        // k must be a foldable literal (like percentile_approx's
        // accuracy argument)
        exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[NGramsGen].getName, "ngrams"),
      (exprs: Seq[Expression]) => NGramsGen(exprs(0),
        // n must be a foldable literal, like misra_gries' k
        exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewriteRule)
    e.injectOptimizerRule(s => graft.plans.MvRewriteRule(s))
    e.injectOptimizerRule(s => graft.plans.JoinEliminationRule(s))
    e.injectOptimizerRule(s => graft.plans.DistinctEliminationRule(s))
    e.injectOptimizerRule(s => graft.plans.SelfJoinEliminationRule(s))
  }
}
