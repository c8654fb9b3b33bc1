package graft.plans

import graft.{SparkSpec, Tables}

/** DISTINCT elimination on declared PKs: fires only where uniqueness
  * is declared AND the child shape preserves it. */
class DistinctEliminationSpec extends SparkSpec {

  private def declare(): Unit = {
    DistinctEliminationRule.ensure(spark)
    FkCatalog.declarePk(spark, s"$sf0001/orders.parquet", "o_orderkey")
  }

  test("DISTINCT containing the PK becomes a Project; answer unchanged") {
    declare()
    val df = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_orderstatus").distinct()
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Aggregate"), s"distinct not eliminated:\n$opt")
    // same rows as an honestly-executed distinct on an undeclared col
    // pair (o_custkey carries real duplicates, so the aggregate there
    // is live and the comparison is not vacuous)
    assert(df.count() ===
      Tables.load(spark, sf0001, "orders").count())
  }

  test("DISTINCT without the PK keeps its aggregate") {
    declare()
    val df = Tables.load(spark, sf0001, "orders")
      .select("o_custkey", "o_orderstatus").distinct()
    assert(df.queryExecution.optimizedPlan.toString.contains("Aggregate"))
  }

  test("count(DISTINCT pk) drops the distinct flag; non-pk keeps it") {
    declare()
    import org.apache.spark.sql.functions._
    val o = Tables.load(spark, sf0001, "orders")
    val pk = o.agg(countDistinct(col("o_orderkey")).as("n"))
    assert(!pk.queryExecution.optimizedPlan.toString.contains("distinct"),
      pk.queryExecution.optimizedPlan.toString)
    val fk = o.agg(countDistinct(col("o_custkey")).as("n"))
    assert(fk.queryExecution.optimizedPlan.toString.contains("distinct"))
    // and the de-distincted count is still the true distinct count
    assert(pk.collect()(0).getLong(0) === o.count())
  }

  test("a join child disqualifies (keys can duplicate through a join)") {
    declare()
    val o = Tables.load(spark, sf0001, "orders")
    val l = Tables.load(spark, sf0001, "lineitem")
    val df = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select("o_orderkey").distinct()
    assert(df.queryExecution.optimizedPlan.toString.contains("Aggregate"))
    // the distinct here is load-bearing: the join duplicates keys (an
    // order has many lineitems), so the kept aggregate really dedups
    val joined = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select("o_orderkey")
    assert(joined.count() > df.count())
  }
}
