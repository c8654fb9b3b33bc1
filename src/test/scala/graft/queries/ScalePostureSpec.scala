package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cluster-scale physical techniques that local-mode correctness tests
  * never exercise on their own: bucketed co-located joins (the "shuffle
  * once at write time, join shuffle-free forever after" layout) and
  * runtime bloom-filter pushdown (AQE's semi-join reduction for
  * selective dimension filters). Both are plan-level properties, so the
  * spec asserts on executed plans, not just results.
  */
class ScalePostureSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed tables join without any shuffle exchange") {
    // The 100 TB fact-to-fact join shape: pay the partitioning ONCE at
    // write time (bucketBy on the join key, same bucket count both
    // sides), then every subsequent join on that key is map-side — no
    // Exchange in the plan. Locally: write orders and lineitem bucketed
    // by order key, join, and assert the executed plan has a
    // SortMergeJoin with zero exchanges of either kind.
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed")
    spark.read.parquet(s"$sf0001/orders.parquet")
      .write.mode("overwrite")
      .option("path", s"$dir/orders_b").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    spark.read.parquet(s"$sf0001/lineitem.parquet")
      .write.mode("overwrite")
      .option("path", s"$dir/lineitem_b").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val rows = joined.collect().map(r => r.getString(0) -> r.getLong(1))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the aggregate ABOVE the join shuffles on its own key as it
      // should; the join subtree (the tree dump prints parents first,
      // so everything after the SMJ line is its inputs) must not —
      // that's the whole point of the bucketed layout. The AQE dump
      // appends an "== Initial Plan ==" echo after the final plan;
      // drop it so the aggregate's Exchange isn't re-read as a child.
      val finalOnly = plan.indexOf("== Initial Plan ==") match {
        case -1 => plan
        case i  => plan.substring(0, i)
      }
      val joinSubtree = finalOnly.substring(finalOnly.indexOf("SortMergeJoin"))
      assert(!joinSubtree.contains("Exchange"),
        s"bucketed join still shuffles its inputs:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan did not use the bucketed layout:\n$plan")
      // same answer as the shuffled plan over the raw parquet
      val expect = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .join(spark.read.parquet(s"$sf0001/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      assert(rows.toMap == expect.toMap)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("selective dimension filter injects a runtime bloom filter") {
    // At scale, a filtered dimension joined to a fact over a shuffle
    // means the fact side shuffles ALL rows, then the join drops most
    // of them. The runtime-filter rule builds a bloom filter from the
    // filtered creation side and pushes might_contain onto the fact
    // scan, cutting the shuffle to approximately the matching rows.
    // Thresholds are sized for production; lower them so the local
    // fixture qualifies and the injection is observable in the plan.
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val dim = spark.read.parquet(s"$sf0001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val fact = spark.read.parquet(s"$sf0001/lineitem.parquet")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    // The third leg of the skew story: q_salted_agg/q_salted_join are
    // the EXPLICIT mitigation (known-hot keys, rewritten plan); this
    // is the RUNTIME one — AQE measures the shuffle output, sees one
    // partition dwarfing the advisory size, and splits the skewed side
    // into subpartitions joined against a replicated other side, with
    // NO query rewrite. Thresholds are production-sized; shrink them
    // so the local fixture's deliberate 90%-one-key skew qualifies.
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // pinned: the session is SHARED across suites and a sibling can
      // leave shuffle.partitions=2 behind — with only TWO post-shuffle
      // partitions the skew median (sizes sorted, index n/2) IS the
      // hot partition and the factor test can never fire (observed as
      // a full-suite-only flake; the failing plan showed
      // hashpartitioning(k, 2) against the suite default of 4)
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // 90k of 100k rows carry key 0 — the hot-vertex profile a
      // follower-graph join hits at scale
      // the md5 payload is incompressible and flows THROUGH the join,
      // so the hot key's shuffle partition is megabytes, not the few
      // KB a key-only row would compress to
      val fact = spark.range(100000)
        .select(when(col("id") < 90000, 0L).otherwise(col("id")).as("k"),
          md5(col("id").cast("string")).as("payload"))
      val dim = spark.range(1000).select(col("id").as("k"),
        (col("id") * 3).as("v"))
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          sum(length(col("payload"))).as("p"))
      val Array(row) = joined.collect()
      // correctness first: the 90000 hot-key rows match dim key 0
      // (v=0); the tail keys [90000, 100000) have no dim partner
      assert(row.getLong(0) === 90000L)
      assert(row.getLong(1) === 0L)
      assert(row.getLong(2) === 90000L * 32)
      // the adaptive wrapper's toString hides the re-planned tree —
      // unwrap to the FINAL plan AQE actually executed
      val plan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), s"expected shuffled join:\n$plan")
      assert(plan.contains("isSkew=true") || plan.contains("skewed"),
        s"AQE did not mark the skewed partition split:\n$plan")
    }
  }
}
