package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GRAPH-BASED ANN inside the IVF layout — the per-cell navigable-
  * small-world family (HNSW without the hierarchy; Malkov & Yashunin
  * 2016's layer-0 graph): each IVF cell carries a kNN graph over its
  * members, and a query greedily walks the graph of each probed cell
  * with a bounded beam instead of scanning the whole inverted list.
  *
  * Distributed shape, 100 TB posture:
  *   - the GRAPH never crosses partitions: edges only connect members
  *     of one cell, so build is the cluster-blocked self-join the
  *     dedup family already uses (cell-sized blocks, never all-pairs
  *     over the corpus) and search touches only the probed cells'
  *     files (the [[IvfIndex.searchIndexed]] static partition
  *     filter);
  *   - per-executor state during a walk is ONE cell's adjacency
  *     (members × (m+2) edges) — the same "a cell fits an executor"
  *     sizing assumption FAISS's IVF-HNSW makes;
  *   - beam width `ef` bounds the walk's visits per (query, cell):
  *     search cost is O(ef · m) sims instead of O(cell) — the win
  *     over plain IVF probing once cells are large.
  *
  * Determinism: neighbor lists and walk order break ties on
  * (sim desc, vec_id asc); every cell's graph is CONNECTED by
  * construction (a vec_id-ordered backbone ring rides along the kNN
  * edges), so with `ef` ≥ cell size the walk provably degrades to the
  * EXACT probed-list search — the property the q_ann_graph hash gate
  * exploits (its oracle is the same SQL replay as q_ann_ivf), while
  * GraphAnnRecallSpec pins recall@k and the bounded-visit claim for
  * small ef.
  *
  * Vectors are the battery's scaled-integer convention
  * (sv: array<long>, nn = ⟨sv,sv⟩): the long dot is exact and
  * order-independent, the final IEEE divide is correctly rounded, so
  * the Scala walk's sims are BIT-IDENTICAL to the engine expression
  * ([[graft.functions.GraftFunctions.cosineFromScaled]]) and to the
  * DuckDB oracle. */
object GraphAnn {

  /** Exact scaled cosine — bit-identical to cosineFromScaled. */
  private[similarity] def cosScaled(a: Array[Long], na: Long,
                                    b: Array[Long], nb: Long): Double = {
    var dot = 0L; var i = 0
    while (i < a.length) { dot += a(i) * b(i); i += 1 }
    dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
  }

  /** Build the per-cell graph index: assign members to cells, compute
    * each member's m nearest IN-CELL neighbors (cluster-blocked
    * self-join + bounded-heap top-k — Catalyst end to end), add the
    * vec_id-ordered backbone ring for connectivity, and persist
    * (vec_id, sv, nn, neighbors) hive-partitioned by centroid_id —
    * the [[IvfIndex.buildIndex]] layout plus an adjacency column. */
  def buildGraphIndex(embeddings: DataFrame, centroids: DataFrame,
                      indexDir: String, m: Int,
                      sim: (Column, Column) => Column): Unit = {
    val e = embeddings.select(col("vec_id"), col("sv"), col("nn"))
    val assigned = IvfIndex.assign(
      e.select(col("vec_id"), col("sv").as("embedding")),
      centroids, sim)
    val members = e.join(assigned, "vec_id")
    // kNN edges inside each cell: block on centroid_id (the dedup
    // family's blocked self-join), top-m per source by exact sim
    val a = members.select(col("centroid_id"), col("vec_id"),
      col("sv"), col("nn"))
    val b = members.select(col("centroid_id"),
      col("vec_id").as("nbr_id"), col("sv").as("b_sv"),
      col("nn").as("b_nn"))
    val pairs = a.join(b, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .withColumn("s", graft.functions.GraftFunctions.cosineFromScaled(
        col("sv"), col("b_sv"), col("nn"), col("b_nn")))
    val knn = graft.plans.TopKPerGroup.topKPerGroup(pairs,
        Seq(col("centroid_id"), col("vec_id")),
        Seq(desc("s"), asc("nbr_id")), m)
      .groupBy("centroid_id", "vec_id")
      .agg(transform(
        array_sort(collect_list(struct((-col("s")).as("neg"),
          col("nbr_id")))),
        x => x.getField("nbr_id")).as("knn"))
    // backbone ring: each member links to its vec_id-order successor
    // and predecessor within the cell (wrapping), so the graph is one
    // connected component regardless of the kNN topology
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("centroid_id").orderBy("vec_id")
    val ring = members.select(col("centroid_id"), col("vec_id"))
      .withColumn("nxt", coalesce(lead(col("vec_id"), 1).over(w),
        first(col("vec_id")).over(
          w.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing))))
      .withColumn("prv", coalesce(lag(col("vec_id"), 1).over(w),
        last(col("vec_id")).over(
          w.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing))))
    members.join(knn, Seq("centroid_id", "vec_id"), "left")
      .join(ring, Seq("centroid_id", "vec_id"))
      .select(col("vec_id"), col("sv"), col("nn"),
        array_distinct(concat(
          coalesce(col("knn"), typedLit(Seq.empty[Long])),
          array(col("nxt"), col("prv"))))
          .as("neighbors"),
        col("centroid_id"))
      .repartition(col("centroid_id"))
      .write.mode("overwrite")
      .partitionBy("centroid_id")
      .parquet(indexDir)
  }

  /** Greedy beam search over the probed cells' graphs. Probe
    * selection and output contract match [[IvfIndex.searchIndexed]]
    * exactly: (query_id, neighbor_id, rank, sim), rank by
    * (sim desc, vec_id asc), self-matches excluded. `ef` is the beam:
    * the walk keeps the best ef candidates seen and stops when the
    * best unexpanded one cannot improve the worst kept — with
    * ef ≥ cell size this visits every member (exact); small ef visits
    * O(ef · degree) members (GraphAnnRecallSpec pins both claims). */
  def searchGraph(spark: SparkSession, indexDir: String,
                  centroids: DataFrame, queries: DataFrame,
                  topK: Int, nProbe: Int, ef: Int,
                  sim: (Column, Column) => Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy("query_id")
      .orderBy(desc("csim"), asc("centroid_id"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("csim", sim(col("qv"), col("cv")))
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id"))
    // (cell -> probing queries) is |queries| × nProbe — driver-tiny,
    // shipped to executors as one broadcast
    val probeRows = probes.collect().map { r =>
      val qv = r.getSeq[Long](1).toArray
      var nn = 0L; var i = 0
      while (i < qv.length) { nn += qv(i) * qv(i); i += 1 }
      (r.getInt(2), (r.getLong(0), qv, nn))
    }
    val byCell = probeRows.groupBy(_._1).map { case (c, xs) =>
      c -> xs.map(_._2).sortBy(_._1)
    }
    val bc = spark.sparkContext.broadcast(byCell)
    val probedIds = byCell.keys.toSeq.sorted
    val cells = spark.read.parquet(indexDir)
      .filter(col("centroid_id").isin(probedIds: _*))
      .select(col("centroid_id"), col("vec_id"), col("sv"),
        col("nn"), col("neighbors"))
      .repartition(col("centroid_id"))
    val efLocal = ef
    val candRdd = cells.rdd.mapPartitions { it =>
      // a hash partition may hold several whole cells; group locally
      val byCellRows = it.map { r =>
        (r.getInt(0), (r.getLong(1), r.getSeq[Long](2).toArray,
          r.getLong(3), r.getSeq[Long](4).toArray))
      }.toSeq.groupBy(_._1)
      byCellRows.iterator.flatMap { case (cellId, rows) =>
        val nodes = rows.map(_._2).map(t => t._1 -> t).toMap
        val entry = nodes.keys.min // deterministic entry point
        val qs = bc.value.getOrElse(cellId, Array.empty)
        qs.iterator.flatMap { case (qid, qv, qnn) =>
          walk(nodes, entry, qv, qnn, efLocal)._1
            .filter(_._1 != qid)
            .map { case (vid, s) => Row(qid, vid, s) }
        }
      }
    }
    val cand = spark.createDataFrame(candRdd, StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false))))
    val top = graft.plans.TopKPerGroup.topKPerGroup(cand,
      Seq(col("query_id")), Seq(desc("sim"), asc("vec_id")), topK)
    val wq = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("vec_id"))
    top.withColumn("rank", row_number().over(wq))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("sim"))
  }

  /** One greedy beam walk; returns (the kept (vec_id, sim) set ≤ ef,
    * the number of members visited — the bounded-work evidence the
    * recall spec asserts on). */
  private[similarity] def walk(
      nodes: Map[Long, (Long, Array[Long], Long, Array[Long])],
      entry: Long, qv: Array[Long], qnn: Long, ef: Int)
      : (Seq[(Long, Double)], Int) = {
    // ord.lt(a, b) ⇔ a is BETTER (higher sim, tie lower id); the
    // queue max under ord is therefore the WORST element
    val ord = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    val candidates = scala.collection.mutable.PriorityQueue
      .empty[(Double, Long)](ord.reverse) // pops best first
    val kept = scala.collection.mutable.PriorityQueue
      .empty[(Double, Long)](ord) // pops worst first
    val seen = scala.collection.mutable.HashSet.empty[Long]
    var visited = 0
    def score(id: Long): Double = {
      val n = nodes(id); cosScaled(qv, qnn, n._2, n._3)
    }
    def offer(id: Long): Unit = if (seen.add(id)) {
      visited += 1
      val s = score(id)
      if (kept.size < ef) { kept.enqueue((s, id)); candidates.enqueue((s, id)) }
      else if (ord.lt((s, id), kept.head)) {
        kept.dequeue(); kept.enqueue((s, id)); candidates.enqueue((s, id))
      }
    }
    offer(entry)
    var done = false
    while (!done && candidates.nonEmpty) {
      val best = candidates.dequeue()
      // can this frontier still beat the worst kept? (only when full)
      if (kept.size >= ef && ord.lt(kept.head, best)) done = true
      else nodes(best._2)._4.foreach(n => if (nodes.contains(n)) offer(n))
    }
    (kept.toSeq.map { case (s, id) => (id, s) }, visited)
  }
}
