package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Battery-wide physical-plan invariants — the scale properties the
  * 100 TB posture depends on, locked into the suite so a refactor that
  * silently degrades a plan (loses a broadcast, plans a cartesian,
  * falls out of codegen, bypasses the custom exec) fails here instead
  * of surfacing as a cluster incident. Plans are inspected at sf0.001
  * (shape is data-independent; AQE may only improve on it at runtime).
  */
class PlanShapeSpec extends SparkSpec {

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf0001).queryExecution.executedPlan.toString
    }

  /** Broadcast theta-joins (query side broadcast, non-equi predicate)
    * and singleton-scalar cross joins (one global-aggregate row
    * broadcast onto a keyed frame, as in q_corpus_mix): a
    * BroadcastNestedLoopJoin is the INTENDED plan — the small side is
    * broadcast and the big side streams. Anywhere else BNLJ means a
    * lost equi-key. */
  private val bnljAllowed = Set(
    "q_ann_bruteforce", "q_ann_quantized", "q_ann_ivf", "q_tfidf",
    "q_corpus_mix")

  test("no query plans a CartesianProduct") {
    for ((name, plan) <- plans)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
  }

  test("BroadcastNestedLoopJoin only where the theta-join broadcasts") {
    for ((name, plan) <- plans
         if plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
      fail(s"$name plans an unexpected BroadcastNestedLoopJoin:\n$plan")
  }

  test("representative queries reach WholeStageCodegen (final plans)") {
    // pre-execution AQE plan strings omit codegen markers, so this
    // asserts on EXECUTED final plans for one query per family
    for (name <- Seq("q_scan_filter_project", "q_count_per_key",
        "q_join_broadcast", "q_dedup_exact", "q_token_count",
        "q_asof_join")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*("), s"$name never enters codegen:\n$plan")
    }
  }

  test("small-dimension joins broadcast (no shuffle of the big side)") {
    for (name <- Seq("q_join_broadcast", "q_decontaminate"))
      assert(plans(name).contains("BroadcastHashJoin"),
        s"$name lost its broadcast join:\n${plans(name)}")
  }

  test("top-k queries run through the custom TopKPerGroupExec") {
    for (name <- Seq("q_ann_bruteforce", "q_ann_quantized", "q_ann_ivf",
        "q_source_cap"))
      assert(plans(name).contains("TopKPerGroup"),
        s"$name bypasses TopKPerGroupExec:\n${plans(name)}")
  }

  test("parquet scans prune columns (no SELECT * reaching the scan)") {
    // q_scan_filter_project reads 3 of 11 lineitem columns; the scan's
    // ReadSchema must not contain the unprojected l_comment-class cols
    val p = plans("q_scan_filter_project")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && !read.contains("l_extendedprice"),
      s"scan reads unprojected columns: $read")
  }
}
