package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step that turns near-duplicate PAIRS into duplicate GROUPS (keep
  * the canonical member per group, drop the rest).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each
  * round rewires edges toward smaller node ids:
  *
  *   large-star(u): m = min(N(u) ∪ {u}); every neighbor v > u
  *                  re-attaches as (v, m)
  *   small-star(u): over edges oriented big→small, m = min(N(u) ∪ {u});
  *                  every smaller neighbor v ≠ m re-attaches as (v, m),
  *                  plus (u, m)
  *
  * Both operations preserve connectivity exactly (every rewire replaces
  * a path through u), and the alternation converges in O(log n) rounds
  * to a set of disjoint STARS centered at each component's minimum id —
  * unlike plain min-label propagation, whose round count equals the
  * component DIAMETER and dies on long duplicate chains. A path graph
  * of 100 nodes converges in ~6 rounds here versus 99 there (see
  * ConnectedComponentsSpec). The fixpoint (every node labeled with the
  * smallest id in its component) is the same, order-independent, so the
  * output is deterministic and engine-independent.
  *
  * Scale posture: each half-round is one aggregate (per-node min) plus
  * one co-partitioned join and a distinct, all shuffling on uniform
  * node-id keys; the edge set never grows beyond one edge per node plus
  * the input size, and only per-round COUNTS reach the driver. Lineage
  * is cut every round with localCheckpoint — without it the plan
  * doubles per iteration and the job dies on analysis long before data
  * becomes the problem. No round-count abort: convergence is a theorem,
  * not a tuning knob.
  */
object ConnectedComponents {

  /** edges: two integral columns (src, dst), undirected, self-loops and
    * duplicates tolerated. Returns (id, cluster_id) for every node that
    * appears in `edges`, cluster_id = min node id of the component. */
  def run(edges: DataFrame): DataFrame = {
    val src = edges.columns(0)
    val dst = edges.columns(1)
    // Materialize the edge list ONCE before deriving node/edge views:
    // the input is typically an expensive candidate-pair plan (LSH/
    // simhash self-join) whose OUTPUT is tiny, and every derived view
    // would otherwise re-execute that self-join.
    val base = edges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .transform(graft.Tables.cut)
    val nodes = base.select(col("u").as("id"))
      .union(base.select(col("v").as("id")))
      .distinct()
      .transform(graft.Tables.cut)
    // canonical big→small orientation, self-loops dropped (their nodes
    // stay in `nodes` and label themselves at the end)
    var e = base.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .transform(graft.Tables.cut)
    var eCnt = e.count()
    var changed = eCnt > 0
    while (changed) {
      val next = graft.Tables.cut(smallStar(largeStar(e)))
      val nextCnt = next.count()
      // distinct sets: equal iff same size and next \ e is empty
      changed = nextCnt != eCnt || next.except(e).limit(1).count() > 0
      e = next
      eCnt = nextCnt
    }
    // converged: disjoint stars — each non-root node points at its
    // component minimum; roots (and isolated nodes) label themselves
    val lab = e.groupBy(col("u").as("id")).agg(min(col("v")).as("lab"))
    nodes.join(lab, Seq("id"), "left")
      .select(col("id"), coalesce(col("lab"), col("id")).as("cluster_id"))
  }

  /** One large-star round: for each node u (over the SYMMETRIC
    * neighbor view), attach every strictly-larger neighbor to
    * m = min(N(u) ∪ {u}). Output keeps the big→small orientation
    * (m ≤ u < v). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** One small-star round over big→small edges: for each node u,
    * m = min(smaller neighbors ∪ {u}); every smaller neighbor v ≠ m
    * re-attaches as (v, m) — still big→small since m is the group
    * minimum — and u keeps (u, m). */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min(col("v")).as("m"))
    e.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .distinct()
  }
}
