package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step that turns near-duplicate PAIRS into duplicate GROUPS (keep
  * the canonical member per group, drop the rest). Implemented as
  * iterative min-label propagation on DataFrames:
  *
  *   label(v) := min(label(v), min over neighbors(label(u)))
  *
  * repeated to fixpoint. Each round is one join + one aggregate; the
  * result is the same fixpoint (every node labeled with the smallest
  * node id in its component) regardless of execution order, so the
  * output is deterministic and engine-independent.
  *
  * Scale posture: rounds needed = component diameter, and duplicate
  * clusters are short-diameter by construction (a hub document links
  * its copies), so the loop terminates in a handful of rounds on real
  * corpora; each round shuffles on uniform node-id keys. Lineage is
  * cut every round with localCheckpoint — without it the plan doubles
  * per iteration and the job dies on analysis long before data becomes
  * the problem. The driver holds only the per-round change COUNT (one
  * long), never node data. For adversarial long-chain graphs,
  * production would switch to the large-star/small-star algorithm
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14) whose round count is O(log n) — same per-round plan shape,
  * so the swap is local to this function.
  */
object ConnectedComponents {

  /** edges: two integral columns (src, dst), undirected, self-loops and
    * duplicates tolerated. Returns (id, cluster_id) for every node that
    * appears in `edges`, cluster_id = min node id of the component. */
  def run(edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    val src = edges.columns(0)
    val dst = edges.columns(1)
    // Materialize the edge list ONCE before mirroring it: the input is
    // typically an expensive candidate-pair plan (LSH/simhash
    // self-join) whose OUTPUT is tiny, and a union of two selects over
    // the raw plan would execute that self-join once per branch.
    val base = edges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .localCheckpoint()
    // both directions, so one join propagates labels across every edge
    val undirected = base
      .union(base.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = undirected.select(col("u").as("id")).distinct()
      .withColumn("lab", col("id"))
      .localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val viaNeighbor = undirected
        .join(labels.withColumnRenamed("id", "v"), "v")
        .select(col("u").as("id"), col("lab"))
      // The node's own row carries its previous label in `old`
      // (neighbor rows contribute MaxValue, so min(old) recovers it);
      // convergence is then a filter over the checkpointed result
      // instead of a per-round join against the previous labels.
      val next = labels
        .select(col("id"), col("lab"), col("lab").as("old"))
        .union(viaNeighbor
          .select(col("id"), col("lab"), lit(Long.MaxValue).as("old")))
        .groupBy("id")
        .agg(min(col("lab")).as("lab"), min(col("old")).as("old"))
        .localCheckpoint()
      changed = next.filter(col("lab") < col("old")).count()
      labels = next.select("id", "lab")
      round += 1
    }
    require(changed == 0,
      s"connected components did not converge in $maxRounds rounds " +
        "(adversarial diameter? switch to large-star/small-star)")
    undirected.unpersist()
    labels.select(col("id"), col("lab").as("cluster_id"))
  }
}
