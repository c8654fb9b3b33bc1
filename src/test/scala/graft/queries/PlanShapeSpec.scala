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
    "q_ann_bruteforce", "q_ann_quantized", "q_ann_ivf", "q_ann_recall",
    "q_ann_ivfpq", "q_ann_srp", "q_contrastive_pairs",
    // the filtered variants keep their parents' broadcast theta shape
    // (5 query vectors broadcast onto the filtered candidate scan /
    // the probed lists)
    "q_ann_filtered", "q_ann_filtered_ivf",
    // the incrementally-grown index serves the IDENTICAL probe plan
    // as q_ann_ivf (same broadcast probe ranking)
    "q_ann_incremental",
    // hybrid retrieval's dense side is the q_ann_bruteforce theta
    // shape (5 probe vectors broadcast onto the corpus scan)
    "q_hybrid_search",
    "q_tfidf", "q_corpus_mix", "q_corpus_mix_temp", "q_collocations",
    "q_zorder",
    "q_curriculum",
    // q_skyline's survivors-vs-survivors dominance anti-join is a
    // deliberately-broadcast theta join on the staircase-pruned set;
    // q_event_pairs / q_ks_drift broadcast singleton frames (basket
    // count / sample sizes)
    "q_skyline", "q_event_pairs", "q_ks_drift",
    // q_t_closeness broadcasts the 7-row sensitive-value distribution
    // and the 1-row total onto the class table
    "q_t_closeness",
    // q_mmr_rerank's candidate stage broadcasts 3 query vectors onto
    // the corpus scan (the q_ann_bruteforce shape); q_kmv_jaccard's
    // source-pair table is a broadcast a<b theta join of a ~20-row
    // frame with itself; q_bm25 broadcasts the 1-row (N, T) corpus
    // stats onto the query-term postings (the q_tfidf shape)
    "q_mmr_rerank", "q_kmv_jaccard", "q_bm25",
    // q_modularity broadcasts the 1-row edge count m;
    // q_partition_agreement meets its three scalar frames (S_ij, S_a,
    // S_b) in singleton crossJoins; q_lm_kneser_ney broadcasts the
    // 1-row bigram-type count B onto the vocabulary-sized model
    "q_modularity", "q_partition_agreement", "q_lm_kneser_ney",
    // q_distinctive_terms broadcasts the 1-row (N, V) totals;
    // q_decay_score broadcasts the 1-row corpus max-ts anchor
    "q_distinctive_terms", "q_decay_score",
    // q_sql_call CROSS JOINs the head aggregate with the tagged
    // version's 1-row count (the tag-survives-vacuum witness)
    "q_sql_call")

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
        "q_source_cap", "q_inverted_index", "q_ann_recall",
        "q_group_mode", "q_distinctive_terms",
        "q_bounded_contribution", "q_dedup_latest"))
      assert(plans(name).contains("TopKPerGroup"),
        s"$name bypasses TopKPerGroupExec:\n${plans(name)}")
  }

  test("dedup consumers read the materialized pair table, not a recompute") {
    // the shared simhash64 pair stage is written ONCE as parquet; every
    // consumer's plan must be a FileScan of that materialization — a
    // consumer whose plan contains the fingerprint aggregate would be
    // re-running the corpus-sized stage per query
    // q_pagerank is exempt: its per-iteration localCheckpoints cut the
    // lineage, so its final plan is a Scan ExistingRDD — the pair scan
    // happened inside the loop and is no longer visible in the string
    val readers = Seq(
      "q_dedup_simhash64" -> "simhash_pairs",
      "q_dedup_source_matrix" -> "simhash_pairs",
      "q_dedup_incremental" -> "simhash_pairs",
      // the triangle pair reads the DEEPER shared materialization —
      // the per-doc quotient-graph stats table (round 16, derived
      // once from the fingerprint classes); q_graph_jaccard
      // deliberately does NOT — per-edge common counts are
      // pair-bounded, so it wedge-closes in flight over the capped
      // adjacency instead of exploding the clique-cubed triangle
      // table (round 13's scale-rung fix)
      "q_triangles" -> "simhash_tristats",
      "q_clustering_coef" -> "simhash_tristats",
      "q_graph_jaccard" -> "simhash_pairs",
      "q_graph_degree" -> "simhash_pairs",
      "q_prep_pipeline" -> "simhash_pairs",
      "q_dedup_cluster" -> "simhash_clusters",
      "q_dedup_keep_one" -> "simhash_clusters",
      // the weighted-dedup pair reads the shared trigram TF postings
      "q_dedup_sparse_cosine" -> "trigram_tf",
      "q_dedup_containment" -> "trigram_tf",
      // the community pair: q_label_prop reports the persisted
      // assignment, q_modularity grades it — neither may re-run the
      // label-propagation loop
      "q_label_prop" -> "simhash_communities",
      "q_modularity" -> "simhash_communities",
      // the Rand-index audit reads BOTH persisted partitions
      "q_partition_agreement" -> "simhash_clusters",
      "q_dedup_lang_matrix" -> "simhash_pairs",
      "q_assortativity" -> "simhash_pairs")
    for ((name, table) <- readers) {
      assert(plans(name).contains(table),
        s"$name does not scan the $table materialization:\n${plans(name)}")
      assert(!plans(name).contains("simhash64"),
        s"$name recomputes the fingerprint stage:\n${plans(name)}")
    }
  }

  test("q_subquery_scalar_in decorrelates to hash joins (no nested loop)") {
    // scalar-agg subqueries must become aggregate + outer join, IN a
    // semi join, NOT IN a (null-aware) anti join — never a per-row
    // re-execution or a nested-loop plan
    val plan = plans("q_subquery_scalar_in")
    assert(plan.contains("LeftSemi"), s"IN lost its semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT IN lost its anti join:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"scalar subqueries not decorrelated into aggregates:\n$plan")
    // strict: the decorrelated plan has no nested-loop join at all
    // (the earlier disjunctive form was vacuous — its LeftAnti arm was
    // already asserted true above, so a BNLJ regression slipped it)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in the decorrelated plan:\n$plan")
  }

  test("q_shard_balance keeps its corpus window partitioned by bucket") {
    // same two-pass contract as q_global_ids: the corpus-sized
    // row_number window must be keyed on the deterministic range
    // bucket (GlobalRank), never a global ORDER BY
    assert(plans("q_shard_balance").contains("windowspecdefinition(__bkt"),
      s"q_shard_balance lost its partitioned window:\n${plans("q_shard_balance")}")
  }

  test("q_dedup_snm keeps its corpus window partitioned by bucket") {
    // the SNM global rank reuses the two-pass shape: the corpus-sized
    // row_number window must be keyed on the deterministic range
    // bucket (GlobalRank), never a global ORDER BY
    assert(plans("q_dedup_snm").contains("windowspecdefinition(__bkt"),
      s"q_dedup_snm lost its partitioned window:\n${plans("q_dedup_snm")}")
  }

  test("q_dedup_bloom prunes the new batch with a might_contain filter") {
    // the bloom prefilter must sit in the plan as a codegen'd scalar
    // predicate (no join, no shuffle) between the scan and the verify
    assert(plans("q_dedup_bloom").contains("might_contain"),
      s"q_dedup_bloom lost its bloom prefilter:\n${plans("q_dedup_bloom")}")
  }

  test("q_mv_rewrite: the aggregate reads the MV, not the fact table") {
    val plan = plans("q_mv_rewrite")
    assert(plan.contains("mv_pricing"),
      s"MvRewriteRule did not redirect the scan:\n$plan")
    assert(!plan.contains("lineitem.parquet"),
      s"q_mv_rewrite still scans the fact table:\n$plan")
  }

  test("q_sketch_table: rollups read sketch bytes, never the corpus") {
    val plan = plans("q_sketch_table")
    assert(plan.contains("hll_vocab"),
      s"q_sketch_table does not read the sketch table:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"q_sketch_table rescans the corpus:\n$plan")
  }

  test("q_dv_delete: pruned scan + hashed anti-join, text never read") {
    val plan = plans("q_dv_delete")
    assert(plan.contains("LeftAnti"),
      s"the DV positional anti-join is missing:\n$plan")
    assert(!plan.contains("text"),
      s"q_dv_delete reads the text column it never uses:\n$plan")
    assert(plan.contains("row_index"),
      s"the positional key is not sourced from file metadata:\n$plan")
  }

  test("q_time_travel: both as-of blocks read the catalog's DSv2 " +
    "chain scan, column-pruned, text never read") {
    // round 13: the query speaks SQL TIMESTAMP AS OF through
    // GraftCatalog, whose scan masks DV positions INSIDE the reader —
    // the plan carries no anti-join at all (strictly better than the
    // old driver-composed join shape): one pruned BatchScan per
    // resolved version
    val plan = plans("q_time_travel")
    assert("graft-chain".r.findAllIn(plan).size >= 2,
      s"each as-of block must read through the catalog chain scan:\n$plan")
    assert("cols=\\[doc_id,source\\]".r.findAllIn(plan).size >= 2,
      s"the projection must prune into the DSv2 reader:\n$plan")
    assert(!plan.contains("text"),
      s"q_time_travel reads the text column it never uses:\n$plan")
    assert(!plan.contains("LeftAnti"),
      s"the DSv2 reader should mask DVs without a join:\n$plan")
  }

  test("q_branch_merge / q_branch_rebase / q_restore: published heads " +
    "read DV-applied and column-pruned") {
    for (name <- Seq("q_branch_merge", "q_branch_rebase", "q_restore")) {
      val plan = plans(name)
      assert(plan.contains("LeftAnti"),
        s"$name's head carries deletion vectors — the anti-join is " +
          s"missing:\n$plan")
      assert(!plan.contains("text"),
        s"$name reads the text column it never uses:\n$plan")
    }
  }

  test("q_table_history: metadata-only — the documents data is never " +
    "scanned") {
    val plan = plans("q_table_history")
    assert(!plan.contains("text") && !plan.contains("n_chars"),
      s"q_table_history must plan over collected manifest arithmetic, " +
        s"not a table scan:\n$plan")
  }

  test("q_gdpr_erase: the compacted head reads sidecar-free and " +
    "column-pruned") {
    val plan = plans("q_gdpr_erase")
    assert(!plan.contains("LeftAnti"),
      s"post-compaction read must have NO DV anti-join left:\n$plan")
    assert(!plan.contains("text"),
      s"q_gdpr_erase reads the text column it never uses:\n$plan")
  }

  test("q_distinct_elim: no distinct aggregation, no corpus shuffle") {
    val plan = plans("q_distinct_elim")
    assert(!plan.contains("distinct"),
      s"count-distinct not de-distincted:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"the eliminated DISTINCT still shuffles the corpus:\n$plan")
  }

  test("q_join_elim: the declared PK-FK join is gone from the plan") {
    val plan = plans("q_join_elim")
    assert(!plan.contains("Join"),
      s"JoinEliminationRule did not fire:\n$plan")
    assert(!plan.contains("nation.parquet"),
      s"q_join_elim still scans the dimension:\n$plan")
  }

  test("q_dpp_join: the fact scan carries a dynamic pruning subquery") {
    val plan = plans("q_dpp_join").toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the fact scan:\n${plans("q_dpp_join")}")
  }

  test("q_selfjoin_elim: the PK self-join is merged into one scan") {
    val plan = plans("q_selfjoin_elim")
    assert(!plan.contains("Join"),
      s"SelfJoinEliminationRule did not fire:\n$plan")
    val scans = plan.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("documents.parquet"))
    assert(scans === 1, s"expected one documents scan, got $scans:\n$plan")
  }

  test("q_range_join_auto: the naive theta join is auto-rewritten") {
    // the user wrote abs(Δt) <= W with no equi key; the optimizer must
    // have injected the 3-bin explode + equi-join (the global
    // no-BNLJ/no-cartesian tests above then prove the join is hashed)
    assert(plans("q_range_join_auto").contains("__range_bin"),
      s"RangeJoinRewriteRule did not fire:\n${plans("q_range_join_auto")}")
  }

  test("q_ann_recall's IVF side reads the persisted index") {
    // the recall evaluation must exercise the PRODUCTION search path
    // (probed persisted index), not fall back to the join-based search
    assert(plans("q_ann_recall").contains("ivf_index_"),
      s"q_ann_recall does not scan the persisted index:\n${plans("q_ann_recall")}")
  }

  test("q_ann_ivf searches the persisted index with a pruned scan") {
    // the production ANN path: the plan must read the hive-partitioned
    // index with a STATIC partition filter on the probed centroid ids
    // (1/K * nProbe of the data), not join corpus-sized frames on
    // vec_id (the layout-less IvfIndex.search shape)
    val plan = plans("q_ann_ivf")
    assert(plan.contains("ivf_index_"),
      s"q_ann_ivf does not scan the persisted index:\n$plan")
    val scanLine = plan.linesIterator
      .find(l => l.contains("FileScan") && l.contains("ivf_index_"))
      .getOrElse(fail(s"no index FileScan in plan:\n$plan"))
    assert(scanLine.contains("PartitionFilters: [centroid_id") &&
      !scanLine.contains("PartitionFilters: []"),
      s"index scan is not partition-pruned:\n$scanLine")
  }

  test("q_ann_ivfpq composes the pruned index scan with ADC-only scoring") {
    // IVF half: same static partition filter as q_ann_ivf
    val plan = plans("q_ann_ivfpq")
    val scanLine = plan.linesIterator
      .find(l => l.contains("FileScan") && l.contains("ivf_index_"))
      .getOrElse(fail(s"no index FileScan in plan:\n$plan"))
    assert(scanLine.contains("PartitionFilters: [centroid_id") &&
      !scanLine.contains("PartitionFilters: []"),
      s"index scan is not partition-pruned:\n$scanLine")
    // PQ half: scored through broadcast ADC-table joins and the
    // bounded-heap exec — never a corpus-side shuffle join
    assert(plan.contains("TopKPerGroup"),
      s"q_ann_ivfpq lost the bounded-heap top-k:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"q_ann_ivfpq shuffle-joins the corpus:\n$plan")
  }

  test("q_bitmap_distinct plans exact distinct without an Expand") {
    // the bitmap aggregate's whole point: exact distinct beside a
    // plain count in ONE pass — no Expand row multiplication, no
    // second distinct shuffle of raw ids
    val plan = plans("q_bitmap_distinct")
    assert(plan.contains("bitmap_distinct"),
      s"q_bitmap_distinct lost the custom aggregate:\n$plan")
    assert(!plan.contains("Expand"),
      s"q_bitmap_distinct plans an Expand:\n$plan")
  }

  test("q_profile_approx plans one pass: HLL sketches, no Expand") {
    // exact multi-column countDistinct costs an Expand that multiplies
    // rows (k+1)x before the aggregate; the approximate sibling must
    // stay a single-pass aggregate of mergeable sketches
    assert(!plans("q_profile_approx").contains("Expand"),
      s"q_profile_approx still plans an Expand:\n${plans("q_profile_approx")}")
    assert(plans("q_profile").contains("Expand"),
      "q_profile lost its Expand — update this invariant pair")
  }

  test("q_quantiles_approx plans one aggregate: no Window, no re-sort") {
    // the exact form pays a per-group sort (row_number window) that
    // cannot pre-aggregate map-side; the sketch form must stay a plain
    // two-phase aggregate — partials per partition, merge at reduce
    assert(!plans("q_quantiles_approx").contains("Window"),
      s"q_quantiles_approx still plans a Window:\n${plans("q_quantiles_approx")}")
    assert(plans("q_quantiles").contains("Window"),
      "q_quantiles lost its Window — update this invariant pair")
  }

  test("q_global_ids keeps its corpus window partitioned by bucket") {
    // the whole point of the two-pass numbering: the corpus-sized
    // row_number window must be keyed on the deterministic range
    // bucket (parallel), never an unpartitioned ORDER BY that funnels
    // the table through one task. (The tiny offsets window — at most
    // 4*32 rows — is the only global one.)
    assert(plans("q_global_ids").contains("windowspecdefinition(__bkt"),
      s"q_global_ids lost its partitioned window:\n${plans("q_global_ids")}")
  }

  test("q_lm_bigram_score materializes the bigram stream once") {
    // the exploded bigram stream feeds model build AND scoring; the
    // plan must read the shared InMemoryRelation (write-once/read-many
    // at scale), not re-explode the corpus per consumer
    val hits = plans("q_lm_bigram_score").linesIterator
      .count(_.contains("InMemoryTableScan"))
    assert(hits >= 2,
      s"bigram stream not shared ($hits cached scans):\n${plans("q_lm_bigram_score")}")
  }

  test("q_dedup_semantic keeps assignment join-free (one equi-join total)") {
    // centroid assignment must stay a literal-argmax COLUMN on the
    // cached vectors — the only join in the plan is the
    // cluster-blocked pair join on centroid_id; any more means the
    // assignment degraded to a corpus-vs-assignment join
    val joins = plans("q_dedup_semantic").linesIterator
      .count(l => l.contains("Join"))
    assert(joins == 1,
      s"q_dedup_semantic expected 1 join, found $joins:\n${plans("q_dedup_semantic")}")
  }

  test("q_kmeans: assignments stay map-only (one broadcast join total)") {
    // both Lloyd assignment passes must be literal-argmax projections;
    // the plan's only join is the broadcast of the 8-row (centroid_id,
    // c0) frame onto the final aggregate input
    val joins = plans("q_kmeans").linesIterator.count(_.contains("Join"))
    assert(joins == 1,
      s"q_kmeans expected 1 join, found $joins:\n${plans("q_kmeans")}")
  }

  test("q_dsir_weight: the bucket-ratio model joins as a broadcast") {
    // DSIR's whole scale story is that both hashed-feature model
    // tables are bucket-sized (<= 1024 rows) and BROADCAST — the
    // corpus featurization pass must never shuffle for the model join
    assert(plans("q_dsir_weight").contains("BroadcastHashJoin"),
      s"q_dsir_weight lost its broadcast model join:\n${plans("q_dsir_weight")}")
  }

  test("q_bm25 / q_dsir_weight: top-k via TakeOrdered, no global sort") {
    // both rankers end in orderBy().limit(k) — the plan must be a
    // TakeOrderedAndProject (per-partition heaps + driver merge of k
    // rows), never a full Sort of the scored frame
    for (name <- Seq("q_bm25", "q_dsir_weight")) {
      assert(plans(name).contains("TakeOrderedAndProject"),
        s"$name lost its TakeOrdered plan:\n${plans(name)}")
    }
  }

  test("q_mv_refresh merges persisted partials; delta filter is pushed") {
    val plan = plans("q_mv_refresh")
    assert(plan.contains("mv_pricing_base"),
      s"refresh does not read the persisted partials:\n$plan")
    // the fact scan must carry the cutoff as a PUSHED filter — the
    // whole point is that history is never rescanned
    val factScan = plan.linesIterator
      .find(l => l.contains("lineitem.parquet")).getOrElse("")
    assert(factScan.contains("GreaterThanOrEqual(l_shipdate"),
      s"delta cutoff not pushed to the fact scan:\n$factScan")
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
