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
  * SORT every partition in full. Work is O(n log k) — at 100 TB the
  * difference between a spilling sort of everything and a streaming
  * pass.
  *
  * Memory bound: retained state is the per-group heaps (<= groups x k
  * rows per task). When that exceeds `graft.topk.spillThreshold` rows
  * (default 4M), the task SPILLS: the current heaps are written to a
  * key-sorted run on local disk and the map restarts empty. On input
  * exhaustion the runs plus the in-memory remainder are k-way merged
  * by group key, re-selecting top-k per group across runs — correct
  * because each run holds that epoch's top-k per group, and the global
  * top-k of a union is the top-k of the union of per-epoch top-k's.
  * Peak memory is therefore O(spillThreshold + runs x k); set the
  * threshold >= k or a single giant group degrades to a spill per k
  * rows (still correct, just slow).
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

  override lazy val metrics = Map(
    "numSpills" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of spilled runs"),
    "spilledRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "rows written to spill runs"))

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
    val spillThreshold = math.max(1,
      conf.getConfString("graft.topk.spillThreshold", "4000000").toInt)
    val numSpills = longMetric("numSpills")
    val spilledRows = longMetric("spilledRows")
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      // materialize heap entries via a projection: the child may emit
      // non-UnsafeRow InternalRows when no exchange was inserted, so a
      // bare asInstanceOf[UnsafeRow] cast would throw at runtime
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ordering = new LazilyGeneratedOrdering(order, childOutput)
      val agg = new TopKSpillableAggregator(kLocal, ordering,
        childOutput.length, spillThreshold, numSpills, spilledRows)
      rows.foreach(r => agg.insert(keyProj(r), rowProj(r), r))
      agg.result()
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

/** Task-local top-k-per-group state with disk spill.
  *
  * In-memory state is a key -> bounded-heap map holding at most
  * `spillThreshold` retained rows. On overflow the map is flushed to a
  * KEY-SORTED run file (length-prefixed key/row bytes — UnsafeRow is a
  * flat byte span, so serialization is just `getBytes`), and rebuilding
  * starts empty. `result()` merges the runs with the in-memory
  * remainder: runs are key-sorted, so a k-way merge streams one group
  * at a time, re-selecting top-k over <= (runs+1) x k candidates —
  * never more than that in memory. Keys order by unsigned byte
  * comparison, which is total and consistent across runs (any total
  * order works; no semantic meaning needed). Run files live in
  * java.io.tmpdir (executor-local disk) and are deleted on task
  * completion. */
private final class TopKSpillableAggregator(
    k: Int, ordering: LazilyGeneratedOrdering, numFields: Int,
    spillThreshold: Int,
    numSpills: org.apache.spark.sql.execution.metric.SQLMetric,
    spilledRows: org.apache.spark.sql.execution.metric.SQLMetric) {

  private val heaps =
    new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
  private val reverse = ordering.reverse
  private var retained = 0
  private val spillFiles = scala.collection.mutable.ArrayBuffer[java.io.File]()

  Option(org.apache.spark.TaskContext.get())
    .foreach(_.addTaskCompletionListener[Unit](_ => cleanup()))

  def insert(key: UnsafeRow, projected: UnsafeRow, raw: InternalRow): Unit = {
    var heap = heaps.get(key)
    if (heap == null) {
      // initial capacity is a hint only (PQ grows as needed): a
      // literal k+1 would eagerly allocate k+1 slots per group and
      // overflow negative at k == Int.MaxValue
      heap = new java.util.PriorityQueue[UnsafeRow](
        if (k >= 16) 16 else k + 1, reverse)
      heaps.put(key.copy(), heap)
      // per-group bounded heap: worst element on top for O(log k) evict
    }
    if (heap.size() < k) {
      heap.add(projected.copy())
      retained += 1
      if (retained > spillThreshold) spill()
    } else if (ordering.compare(raw, heap.peek()) < 0) {
      heap.poll()
      heap.add(projected.copy())
    }
  }

  /** Write the whole map as one key-sorted run, then restart empty. */
  private def spill(): Unit = {
    val entries = new Array[java.util.Map.Entry[
      UnsafeRow, java.util.PriorityQueue[UnsafeRow]]](heaps.size())
    heaps.entrySet().toArray(entries)
    java.util.Arrays.sort(entries,
      (a: java.util.Map.Entry[UnsafeRow, java.util.PriorityQueue[UnsafeRow]],
       b: java.util.Map.Entry[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]) =>
        java.util.Arrays.compareUnsigned(a.getKey.getBytes, b.getKey.getBytes))
    val f = java.io.File.createTempFile("graft-topk-spill", ".run")
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f), 256 * 1024))
    try {
      entries.foreach { e =>
        val kb = e.getKey.getBytes
        out.writeInt(kb.length); out.write(kb)
        val h = e.getValue
        out.writeInt(h.size())
        val it = h.iterator()
        while (it.hasNext) {
          val rb = it.next().getBytes
          out.writeInt(rb.length); out.write(rb)
          spilledRows.add(1)
        }
      }
      out.writeInt(-1) // end marker
    } finally out.close()
    spillFiles += f
    numSpills.add(1)
    heaps.clear()
    retained = 0
  }

  /** One spill run as an iterator of (keyBytes, candidate rows). */
  private final class RunReader(f: java.io.File)
      extends Iterator[(Array[Byte], Array[UnsafeRow])] {
    private val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(f), 256 * 1024))
    private var nextKeyLen = in.readInt()
    override def hasNext: Boolean = nextKeyLen >= 0
    override def next(): (Array[Byte], Array[UnsafeRow]) = {
      val kb = new Array[Byte](nextKeyLen); in.readFully(kb)
      val n = in.readInt()
      val rows = Array.tabulate(n) { _ =>
        val rb = new Array[Byte](in.readInt()); in.readFully(rb)
        val r = new UnsafeRow(numFields)
        r.pointTo(rb, rb.length)
        r
      }
      nextKeyLen = in.readInt()
      if (nextKeyLen < 0) in.close()
      (kb, rows)
    }
  }

  def result(): Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    def sortedBest(candidates: Array[UnsafeRow]): Iterator[UnsafeRow] = {
      java.util.Arrays.sort(candidates, ordering)
      candidates.iterator.take(k)
    }
    if (spillFiles.isEmpty) {
      // fast path: nothing spilled, emit straight from the map
      heaps.values().iterator().asScala.flatMap { h =>
        sortedBest(h.toArray(new Array[UnsafeRow](h.size())))
      }
    } else {
      // in-memory remainder becomes one more (pre-sorted) run
      val memRun: Iterator[(Array[Byte], Array[UnsafeRow])] =
        heaps.entrySet().asScala.toSeq
          .map(e => (e.getKey.getBytes,
            e.getValue.toArray(new Array[UnsafeRow](e.getValue.size()))))
          .sortWith((a, b) =>
            java.util.Arrays.compareUnsigned(a._1, b._1) < 0)
          .iterator
      val sources = spillFiles.toSeq.map(new RunReader(_)) :+ memRun
      kWayMergeTopK(sources, sortedBest)
    }
  }

  /** Merge key-sorted runs; per distinct key, concat the <= k
    * candidates from every run holding that key and re-select top k. */
  private def kWayMergeTopK(
      sources: Seq[Iterator[(Array[Byte], Array[UnsafeRow])]],
      select: Array[UnsafeRow] => Iterator[UnsafeRow]): Iterator[InternalRow] = {
    final case class Head(var key: Array[Byte], var rows: Array[UnsafeRow],
                          src: Iterator[(Array[Byte], Array[UnsafeRow])])
    val pq = new java.util.PriorityQueue[Head](math.max(1, sources.size),
      (a: Head, b: Head) => java.util.Arrays.compareUnsigned(a.key, b.key))
    sources.foreach { s =>
      if (s.hasNext) { val (kb, rs) = s.next(); pq.add(Head(kb, rs, s)) }
    }
    new Iterator[InternalRow] {
      private var current: Iterator[UnsafeRow] = Iterator.empty
      override def hasNext: Boolean = {
        while (!current.hasNext && !pq.isEmpty) advanceGroup()
        current.hasNext
      }
      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException
        current.next()
      }
      private def advanceGroup(): Unit = {
        val first = pq.poll()
        val key = first.key
        var candidates = first.rows
        refill(first)
        while (!pq.isEmpty &&
               java.util.Arrays.compareUnsigned(pq.peek().key, key) == 0) {
          val h = pq.poll()
          candidates = candidates ++ h.rows
          refill(h)
        }
        current = select(candidates)
      }
      private def refill(h: Head): Unit =
        if (h.src.hasNext) {
          val (kb, rs) = h.src.next(); h.key = kb; h.rows = rs; pq.add(h)
        }
    }
  }

  private def cleanup(): Unit = spillFiles.foreach { f =>
    try { f.delete(); () } catch { case _: Throwable => }
  }
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
