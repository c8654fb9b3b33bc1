package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator extension (SURVEY.md §7 preference (c)):
  * exact top-k rows per group, executed with bounded per-group heaps
  * instead of the `row_number().over(window) <= k` pattern, which must
  * SORT every partition in full. Memory is O(groups x k) per
  * partition, work is O(n log k) — at 100 TB the difference between a
  * spilling sort of everything and a streaming pass.
  *
  * Pieces: logical node [[TopKPerGroup]] -> strategy [[TopKStrategy]]
  * (planLater child + exec) -> [[TopKPerGroupExec]] (declares
  * ClusteredDistribution so Catalyst inserts the hash exchange) ->
  * registered via [[graft.GraftExtensions]] (injectPlannerStrategy) or
  * used directly through [[TopKPerGroup.topKPerGroup]].
  */
case class TopKPerGroup(
    groupBy: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(keys, order, k, child) =>
      TopKPerGroupExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupBy: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // ask Catalyst for co-location of each group on one partition; the
  // planner inserts the ShuffleExchange (and AQE may coalesce it)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupBy) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable expression lists; generated projections
    // and orderings must be instantiated inside each task
    val groupExprs = groupBy
    val order = sortOrder
    val childOutput = child.output
    val kLocal = k
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      // materialize heap entries via a projection: the child may emit
      // non-UnsafeRow InternalRows when no exchange was inserted, so a
      // bare asInstanceOf[UnsafeRow] cast would throw at runtime
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ordering = new LazilyGeneratedOrdering(order, childOutput)
      val k = kLocal
      // per-group bounded heap: worst element on top for O(log k) evict
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[UnsafeRow]]()
      val reverse = ordering.reverse
      rows.foreach { r =>
        val key = keyProj(r)
        var heap = heaps.get(key)
        if (heap == null) {
          // initial capacity is a hint only (PQ grows as needed): a
          // literal k+1 would eagerly allocate k+1 slots per group and
          // overflow negative at k == Int.MaxValue
          heap = new java.util.PriorityQueue[UnsafeRow](
            if (k >= 16) 16 else k + 1, reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < k) heap.add(rowProj(r).copy())
        else if (ordering.compare(r, heap.peek()) < 0) {
          heap.poll()
          heap.add(rowProj(r).copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        val arr = h.toArray(new Array[UnsafeRow](h.size()))
        java.util.Arrays.sort(arr, ordering)
        arr.iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopKPerGroup {
  /** DataFrame API: top `k` rows per `groupCols`, best-first by
    * `orderCols`. Equivalent rows to
    * `row_number().over(Window.partitionBy(groupCols).orderBy(orderCols)) <= k`
    * (without the rank column), but heap-based. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column],
                   orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    // one-time per session; idempotent
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val plan = TopKPerGroup(
      groupCols.map(GraftSqlShims.expression(spark, _)),
      orderCols.map(GraftSqlShims.expression(spark, _) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }),
      k,
      df.queryExecution.analyzed)
    GraftSqlShims.ofRows(spark, plan)
  }
}
