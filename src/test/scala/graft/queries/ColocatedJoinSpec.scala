package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The co-location claim behind q_colocated_join, made literal: with
  * broadcast disabled (so nothing can hide the shuffle), a join of
  * the two bucketed tables plans with ZERO Exchange — the persisted
  * bucket layout IS the join partitioning. A same-shape join of the
  * raw (unbucketed) parquet must shuffle, pinning that the absence
  * of Exchange comes from bucketing, not from the data being small. */
class ColocatedJoinSpec extends SparkSpec {

  test("bucketed join plans with zero Exchange; raw join shuffles") {
    val fn = graft.SparkEntry.queries("q_colocated_join")
    fn(spark, sf0001).collect() // builds + registers the tables
    val t1 = spark.catalog.listTables()
      .filter(_.name.startsWith("graft_docs_bkt_")).head.name
    val t2 = spark.catalog.listTables()
      .filter(_.name.startsWith("graft_emb_bkt_")).head.name
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = spark.table(t1).join(spark.table(t2), "doc_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join shuffled:\n$plan")
      val raw = graft.Tables.load(spark, sf0001, "documents")
        .select("doc_id", "lang")
        .join(graft.Tables.load(spark, sf0001, "embeddings")
          .select(col("vec_id").as("doc_id"), col("label")), "doc_id")
      assert(raw.queryExecution.executedPlan.toString
        .contains("Exchange"), "control join did not shuffle")
      // co-location changes the plan, never the rows
      assert(j.count() === raw.count())
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("a point filter on the bucket column prunes to one bucket") {
    graft.SparkEntry.queries("q_colocated_join")(spark, sf0001)
      .collect() // ensures the tables exist
    val t1 = spark.catalog.listTables()
      .filter(_.name.startsWith("graft_docs_bkt_")).head.name
    // the planner's DisableUnnecessaryBucketedScan turns OFF bucketed
    // reading for a scan-only query (no interesting distribution to
    // preserve), which also forfeits pruning — disable the auto rule
    // to assert the pruning capability itself
    val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val saved = spark.conf.get(k)
    try {
      spark.conf.set(k, "false")
      val q = spark.table(t1).filter(col("doc_id") === 42L)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning missing:\n$plan")
      assert(q.count() === 1L)
    } finally spark.conf.set(k, saved)
  }
}
