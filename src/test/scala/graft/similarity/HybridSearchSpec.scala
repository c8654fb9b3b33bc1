package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The hybrid-retrieval claims q_hybrid_search's hash gate doesn't
  * spell out:
  *   - FUSION SEMANTICS: a doc on BOTH top-50 lists carries both RRF
  *     terms; a doc on one list carries exactly that list's term —
  *     recomputed here from the rank columns the query itself emits;
  *   - AGREEMENT BEATS EITHER ALONE: any doc ranked in both lists'
  *     top-50 outranks every single-list doc whose one rank is not
  *     dramatically better (the monotonicity RRF is chosen for);
  *   - PLAN SHAPE: both candidate joins broadcast their 5-probe side
  *     — the corpus is never shuffled for the join, and no cartesian
  *     product appears (the sparse side joins on rare TERMS, the
  *     dense side on an inequality over a 5-row broadcast). */
class HybridSearchSpec extends SparkSpec {

  test("RRF arithmetic recomputes from the emitted ranks; both-list " +
    "docs outrank comparable single-list docs; k and grouping hold") {
    val rows = graft.SparkEntry.queries("q_hybrid_search")(spark,
      sf0001).collect()
    assert(rows.nonEmpty)
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    perQ.values.foreach(g => assert(g.length <= 10))
    rows.foreach { r =>
      val rs = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val rd = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(rs.isDefined || rd.isDefined,
        "a fused row must come from at least one list")
      val expect = rs.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rd.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getDouble(4) === expect,
        s"rrf must recompute exactly from the rank columns: $r")
    }
    // monotonicity: a doc in both lists at ranks (a, b) beats any
    // single-list doc with rank >= min(a, b)
    perQ.values.foreach { g =>
      val both = g.filter(r => !r.isNullAt(2) && !r.isNullAt(3))
      val single = g.filter(r => r.isNullAt(2) ^ r.isNullAt(3))
      for (b <- both; s <- single) {
        val sRank = if (s.isNullAt(2)) s.getLong(3) else s.getLong(2)
        val bMin = math.min(b.getLong(2), b.getLong(3))
        if (sRank >= bMin)
          assert(b.getDouble(4) > s.getDouble(4),
            s"both-list $b must out-fuse single-list $s")
      }
    }
  }

  test("plan shape: the probe sides broadcast, no cartesian product, " +
    "and the fused frame is bounded by 2 lists x 5 queries x 50") {
    val df = graft.SparkEntry.queries("q_hybrid_search")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast probe joins, got:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"),
      "hybrid retrieval must never plan a cartesian product")
    // the pre-fusion lists are k-bounded: re-derive their sizes
    val e = graft.Tables.load(spark, sf0001, "embeddings").count()
    assert(e > 50, "corpus must be larger than the kept lists")
    assert(df.count() <= 5L * 10L)
  }
}
