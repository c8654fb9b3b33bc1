package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, IsNotNull, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** PK–FK join elimination: an equi-join to a dimension table whose
  * columns are never used (beyond the join key itself) is removed
  * entirely — the classic warehouse optimization that Oracle, Redshift
  * and Snowflake perform on RELY constraints, done the Catalyst way.
  *
  * Soundness needs two declared facts about the data, exactly the
  * RELY-constraint contract:
  *   1. the dimension key is UNIQUE (PK) — so the join cannot
  *      duplicate fact rows;
  *   2. the fact FK is NON-NULL and every value appears in the
  *      dimension (referential integrity) — so an inner join cannot
  *      drop fact rows either.
  * Under (1)+(2) the join is a bijection on fact rows; if the query
  * only reads fact columns (the dim key may be read too: it equals
  * the FK by the join predicate), the join is the identity and the
  * plan can skip scanning the dimension altogether. As with RELY in
  * the commercial engines, a FALSE declaration yields wrong answers —
  * the catalog is a statement about the data, not a hint. The battery
  * gate (`q_join_elim`) proves the honest case end-to-end: DuckDB
  * executes the join, the rewritten plan never does, hashes match.
  *
  * At 100 TB the win is structural: the fact-side scan is petabytes
  * and the join — even broadcast — forces a full pass through the
  * probe side plus the dimension broadcast per query. BI tools and
  * generated SQL join every dimension unconditionally; elimination
  * makes the generated query cost the same as the hand-written one.
  *
  * Conservative by construction, mirroring MvRewriteRule: only a
  * Project directly over an Inner/LeftOuter single-predicate equi-join
  * qualifies; the dimension side must be a bare (column-pruned) scan
  * of the declared PK path — the only dim-side Filter admitted is the
  * `IsNotNull(pk)` the optimizer infers from the equi-join itself
  * (anything else would drop fact rows); the fact side may carry
  * filters/pruning (they only remove fact rows, which elimination
  * preserves — including the inferred `IsNotNull(fk)`, which keeps
  * the plan honest even against a false non-null declaration). Any
  * shape it does not recognize is left untouched — a missed rewrite
  * is a performance miss, never a wrong answer.
  */
object FkCatalog {

  /** One declared RELY constraint: `factPath.fkCol` is non-null and
    * references unique key `dimPath.pkCol`. */
  case class FkDecl(factPath: String, fkCol: String,
                    dimPath: String, pkCol: String)

  private val reg = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String, String, String), FkDecl]()

  /** Declared primary keys: `path.col` is UNIQUE and NON-NULL. */
  private val pkReg = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), java.lang.Boolean]()

  private def norm(p: String): String = p.stripPrefix("file:")

  def declare(s: SparkSession, d: FkDecl): Unit = {
    reg.put((s, norm(d.factPath), d.fkCol, norm(d.dimPath), d.pkCol), d)
    // an FK target is by definition a primary key — feed the
    // distinct-elimination rule too
    declarePk(s, d.dimPath, d.pkCol)
  }

  def declarePk(s: SparkSession, path: String, col: String): Unit =
    pkReg.put((s, norm(path), col), java.lang.Boolean.TRUE)

  def isPk(s: SparkSession, path: String, col: String): Boolean =
    pkReg.containsKey((s, norm(path), col))

  def declared(s: SparkSession, factPath: String, fkCol: String,
               dimPath: String, pkCol: String): Boolean =
    reg.containsKey((s, norm(factPath), fkCol, norm(dimPath), pkCol))
}

object JoinEliminationRule {
  /** In-process registration on the experimental optimizer hook (the
    * battery/test path; GraftExtensions injects the same rule for
    * extension-built sessions). Idempotent via case-class equality. */
  def ensure(spark: SparkSession): Unit = {
    val r = JoinEliminationRule(spark)
    if (!spark.experimental.extraOptimizations.contains(r))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ r
  }
}

case class JoinEliminationRule(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(_, j: Join) => tryEliminate(p, j).getOrElse(p)
  }

  /** Root path of a scan subtree. `dimKey` distinguishes the two
    * sides: the fact side (dimKey = None) may carry arbitrary filters
    * — elimination keeps exactly the surviving fact rows — while the
    * dim side admits ONLY `IsNotNull(pk)` conjuncts (the optimizer
    * infers that one from the equi-join itself, so it cannot drop a
    * row the join would have kept); any other dim filter makes the
    * join row-dropping, which elimination would undo. */
  private def scanPath(p: LogicalPlan,
                       dimKey: Option[AttributeReference]): Option[String] =
    p match {
      case l: LogicalRelation => l.relation match {
        // EXACTLY one root path: a multi-path scan whose first root
        // happens to match the declared path can still read extra
        // files that duplicate keys, which would break the "missed
        // rewrite, never a wrong answer" invariant
        case h: HadoopFsRelation if h.location.rootPaths.lengthCompare(1) == 0 =>
          Some(h.location.rootPaths.head.toString)
        case _ => None
      }
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        scanPath(c, dimKey)
      case Filter(cond, c) =>
        dimKey match {
          case None => scanPath(c, None)
          case Some(pk)
              if splitConjunctivePredicates(cond).forall {
                case IsNotNull(a: AttributeReference) => a.exprId == pk.exprId
                case _ => false
              } =>
            scanPath(c, dimKey)
          case _ => None
        }
      case _ => None
    }

  private def tryEliminate(p: Project, j: Join): Option[LogicalPlan] = {
    if (j.joinType != Inner && j.joinType != LeftOuter) return None
    val (fk, pk) = j.condition match {
      case Some(EqualTo(a: AttributeReference, b: AttributeReference)) =>
        // orient: which side is the dim? LeftOuter can only drop the
        // RIGHT side, so the dim must be on the right there.
        if (j.right.outputSet.contains(b) && j.left.outputSet.contains(a))
          (a, b)
        else if (j.joinType == Inner &&
            j.left.outputSet.contains(b) && j.right.outputSet.contains(a))
          (b, a)
        else return None
      case _ => return None
    }
    val (factSide, dimSide) =
      if (j.right.outputSet.contains(pk)) (j.left, j.right)
      else (j.right, j.left)
    // everything the Project reads must come from the fact side, the
    // single exception being the dim PK (it equals the FK row-by-row)
    if (!(p.references -- factSide.outputSet).subsetOf(
        org.apache.spark.sql.catalyst.expressions.AttributeSet(pk)))
      return None
    for {
      factPath <- scanPath(factSide, dimKey = None)
      dimPath <- scanPath(dimSide, dimKey = Some(pk))
      if FkCatalog.declared(session, factPath, fk.name, dimPath, pk.name)
    } yield {
      val projected: Seq[NamedExpression] = p.projectList.map {
        case a: AttributeReference if a.exprId == pk.exprId =>
          // keep the ORIGINAL exprId so parent references stay valid
          Alias(fk, a.name)(exprId = a.exprId)
        case ne => ne.transform {
          case a: AttributeReference if a.exprId == pk.exprId => fk
        }.asInstanceOf[NamedExpression]
      }
      Project(projected, factSide)
    }
  }
}

object SelfJoinEliminationRule {
  def ensure(spark: SparkSession): Unit = {
    val r = SelfJoinEliminationRule(spark)
    if (!spark.experimental.extraOptimizations.contains(r))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ r
  }
}

/** SELF-join elimination on a declared primary key — the third RELY
  * payoff: generated SQL routinely assembles a wide row by computing
  * column subsets of the SAME table in separate subqueries and
  * re-joining them on the key (metric CTEs, BI semantic layers,
  * dbt-style staging models). On a declared PK the self-join is a
  * bijection — each left row meets exactly the one right row with its
  * own key — so the merged plan is ONE scan with both sides' columns
  * and both sides' filters ANDed; the join, the second corpus scan,
  * and the key shuffle all disappear. At 100 TB that halves the I/O
  * and deletes the plan's only exchange. SQL Server ("table
  * elimination") and Oracle perform exactly this rewrite on unique
  * constraints.
  *
  * Soundness: PK uniqueness makes the join at-most-one-to-one;
  * non-nullness (part of the PK declaration) makes an inner join on
  * pk=pk keep precisely the rows surviving both sides' filters —
  * which is what the AND of the remapped filters computes. Each
  * side's filter conjuncts are collected on the walk down (any
  * non-Filter/Project shape disqualifies), so a row dropped by ONE
  * side drops from the merge exactly as the join would have dropped
  * it. A FALSE declaration (duplicate "pk" values) yields wrong
  * answers — the RELY contract, same as the siblings above; the
  * battery gate's oracle executes the real self-join so the hash
  * match proves the honest case.
  *
  * Conservative by construction: only Project-over-Inner-Join with a
  * single pk=pk equi-predicate where both sides walk down (through
  * attribute-only Projects and arbitrary Filters) to single-root-path
  * scans of the SAME declared path. Anything else — renamed keys,
  * joins/generators on a side, multi-path scans — is left untouched:
  * a missed rewrite is a performance miss, never a wrong answer.
  */
case class SelfJoinEliminationRule(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, ExprId, Expression}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(_, j: Join) => tryMerge(p, j).getOrElse(p)
  }

  /** Walk down through attribute-only Projects and Filters to a
    * single-root-path scan, collecting filter conjuncts. */
  private def walk(p: LogicalPlan)
      : Option[(LogicalRelation, Seq[Expression])] = p match {
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation if h.location.rootPaths.lengthCompare(1) == 0 =>
        Some((l, Nil))
      case _ => None
    }
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      walk(c)
    case Filter(cond, c) =>
      walk(c).map { case (l, cs) =>
        (l, cs ++ splitConjunctivePredicates(cond))
      }
    case _ => None
  }

  private def pathOf(l: LogicalRelation): String =
    l.relation.asInstanceOf[HadoopFsRelation]
      .location.rootPaths.head.toString

  private def tryMerge(p: Project, j: Join): Option[LogicalPlan] = {
    if (j.joinType != Inner) return None
    val pkName = j.condition match {
      case Some(EqualTo(x: AttributeReference, y: AttributeReference))
          if x.name == y.name &&
            (j.left.outputSet.contains(x) != j.left.outputSet.contains(y)) =>
        x.name
      case _ => return None
    }
    for {
      (lRel, lConds) <- walk(j.left)
      (rRel, rConds) <- walk(j.right)
      if pathOf(lRel) == pathOf(rRel)
      if FkCatalog.isPk(session, pathOf(lRel), pkName)
      // right-relation attributes map to the left relation's by name
      // (same table ⇒ same column set, exprIds differ per read); a
      // schema divergence between the two reads disqualifies
      byName = lRel.output.map(o => o.name -> o).toMap
      if rRel.output.forall(r => byName.contains(r.name))
    } yield {
      val mapping: Map[ExprId, AttributeReference] = rRel.output.map(r =>
        r.exprId -> byName(r.name).asInstanceOf[AttributeReference]).toMap
      def remap(e: Expression): Expression = e.transform {
        case ar: AttributeReference => mapping.getOrElse(ar.exprId, ar)
      }
      val cond = (lConds ++ rConds.map(remap)).reduceOption(And)
      val base: LogicalPlan = cond.map(Filter(_, lRel)).getOrElse(lRel)
      val projected: Seq[NamedExpression] = p.projectList.map {
        case ar: AttributeReference if mapping.contains(ar.exprId) =>
          // keep the ORIGINAL exprId so parent references stay valid
          Alias(mapping(ar.exprId), ar.name)(exprId = ar.exprId)
        case ne => remap(ne).asInstanceOf[NamedExpression]
      }
      Project(projected, base)
    }
  }
}

object DistinctEliminationRule {
  def ensure(spark: SparkSession): Unit = {
    val r = DistinctEliminationRule(spark)
    if (!spark.experimental.extraOptimizations.contains(r))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ r
  }
}

/** DISTINCT elimination on declared primary keys — the second RELY
  * payoff in this file: `SELECT DISTINCT ...` whose column set
  * contains a declared PK of the scanned table is a per-row identity
  * (every row is already unique), yet Spark plans it as a full
  * hash-aggregate over a corpus-wide shuffle. The rewrite replaces
  * the Aggregate with a Project; at 100 TB that deletes the single
  * most expensive operator in the query. Similarly `count(DISTINCT
  * pk)` drops its distinct flag (PK ⇒ unique AND non-null, so plain
  * count over the column is identical) — skipping the dedicated
  * one-distinct physical planning that doubles the aggregation
  * stages. Both shapes are everywhere in generated BI SQL, which
  * bolts DISTINCT onto key columns defensively.
  *
  * Conservative like its siblings: the child must be a (possibly
  * filtered/pruned) scan of the declared path — filters keep
  * uniqueness, joins/generators may not (a join can DUPLICATE key
  * values, so any other child shape disqualifies). Pure-DISTINCT
  * detection requires the result exprs to be exactly the grouping
  * attrs (no aggregate functions hiding in the output). A false PK
  * declaration yields wrong answers — the RELY contract; the battery
  * gate's oracle executes the real DISTINCT so the hash match proves
  * the honest case.
  */
case class DistinctEliminationRule(session: SparkSession)
    extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
  import org.apache.spark.sql.catalyst.plans.logical.Aggregate

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(grouping, result, child, _) =>
      scanOf(child) match {
        case None => agg
        case Some(path) =>
          val hasPk = grouping.exists {
            case a: AttributeReference => FkCatalog.isPk(session, path, a.name)
            case _ => false
          }
          if (hasPk && grouping.forall(_.isInstanceOf[AttributeReference]) &&
              result.nonEmpty &&
              result.forall(_.isInstanceOf[AttributeReference]) &&
              result.map(_.exprId).toSet.subsetOf(
                grouping.map(_.asInstanceOf[AttributeReference].exprId).toSet))
            // pure DISTINCT over a set containing the PK → identity
            // (column pruning may have narrowed the output to a subset
            // of the grouping keys — each base row is still one group,
            // so projecting the subset is the same multiset)
            Project(result, child)
          else {
            // count(DISTINCT pk) → count(pk): unique + non-null makes
            // them equal row-for-row
            val rewritten = agg.aggregateExpressions.map(_.transform {
              case ae @ AggregateExpression(
                  c @ Count(Seq(a: AttributeReference)), _, true, None, _)
                  if FkCatalog.isPk(session, path, a.name) =>
                ae.copy(isDistinct = false)
            }.asInstanceOf[NamedExpression])
            if (rewritten == agg.aggregateExpressions) agg
            else agg.copy(aggregateExpressions = rewritten)
          }
      }
  }

  /** Path of a (possibly filtered / column-pruned) bare scan; any
    * other child shape could duplicate key values. */
  private def scanOf(p: LogicalPlan): Option[String] = p match {
    case l: LogicalRelation => l.relation match {
      // exactly one root path, same reasoning as JoinEliminationRule:
      // extra paths could duplicate the declared key
      case h: HadoopFsRelation if h.location.rootPaths.lengthCompare(1) == 0 =>
        Some(h.location.rootPaths.head.toString)
      case _ => None
    }
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      scanOf(c)
    case Filter(_, c) => scanOf(c)
    case _ => None
  }
}
