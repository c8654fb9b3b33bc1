package graft.plans

import graft.SparkSpec
import graft.plans.TopKPerGroup.topKPerGroup
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  test("top-3 per nation equals the window row_number formulation") {
    val c = spark.read.parquet(s"$sf0001/customer.parquet")
    val got = topKPerGroup(c,
      Seq(col("c_nationkey")),
      Seq(desc("c_acctbal"), asc("c_custkey")), 3)
      .select("c_nationkey", "c_custkey").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    val ref = c.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("c_nationkey", "c_custkey").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got === ref)
    assert(got.nonEmpty)
  }

  test("groups smaller than k return all their rows, best-first order") {
    val df = Seq((1, 10.0), (1, 30.0), (2, 5.0)).toDF("g", "v")
    val rows = topKPerGroup(df, Seq(col("g")), Seq(desc("v")), 5)
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(rows.toSet === Set((1, 30.0), (1, 10.0), (2, 5.0)))
    // within a group, rows come best-first
    val g1 = rows.filter(_._1 == 1).map(_._2)
    assert(g1.toSeq === Seq(30.0, 10.0))
  }

  test("plan contains TopKPerGroupExec over a hash exchange, no sort") {
    val c = spark.read.parquet(s"$sf0001/customer.parquet")
    val df = topKPerGroup(c, Seq(col("c_nationkey")), Seq(desc("c_acctbal")), 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup ["), plan) // exec renders without the Exec suffix
    assert(plan.contains("hashpartitioning(c_nationkey"), plan)
    assert(!plan.contains("Sort ["), plan) // bounded heaps, no partition sort
  }

  test("exec handles ties and duplicate rows deterministically") {
    val df = Seq((1, 7.0, "a"), (1, 7.0, "b"), (1, 7.0, "c"), (1, 9.0, "d"))
      .toDF("g", "v", "id")
    val rows = topKPerGroup(df, Seq(col("g")),
      Seq(desc("v"), asc("id")), 2)
      .select("id").collect().map(_.getString(0)).toSeq
    assert(rows === Seq("d", "a"))
  }
}
