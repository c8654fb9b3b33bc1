package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame

/** PK–FK join elimination: the declared-constraint rewrite must drop
  * the dimension join when (and only when) the rewrite is sound. */
class JoinEliminationSpec extends SparkSpec {

  private def declare(): Unit = {
    JoinEliminationRule.ensure(spark)
    FkCatalog.declare(spark, FkCatalog.FkDecl(
      s"$sf0001/customer.parquet", "c_nationkey",
      s"$sf0001/nation.parquet", "n_nationkey"))
  }

  private def joined(): DataFrame = {
    val c = Tables.load(spark, sf0001, "customer")
    val n = Tables.load(spark, sf0001, "nation")
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .select(c("c_custkey"), c("c_name"), n("n_nationkey").as("nk"))
  }

  test("declared PK-FK join is eliminated and answer-identical") {
    declare()
    val df = joined()
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Join"), s"join not eliminated:\n$opt")
    // answer-identical to the physically-executed join (rule disabled
    // by routing through a filtered dim, which disqualifies)
    val c = Tables.load(spark, sf0001, "customer")
    val n = Tables.load(spark, sf0001, "nation")
      .filter("n_nationkey >= 0") // dim filter → rule stands down
    val real = c.join(n, c("c_nationkey") === n("n_nationkey"))
      .select(c("c_custkey"), c("c_name"), n("n_nationkey").as("nk"))
    assert(df.orderBy("c_custkey").collect().toSeq ===
      real.orderBy("c_custkey").collect().toSeq)
  }

  test("dim-side filter disqualifies the rewrite") {
    declare()
    val c = Tables.load(spark, sf0001, "customer")
    val n = Tables.load(spark, sf0001, "nation").filter("n_regionkey = 1")
    val df = c.join(n, c("c_nationkey") === n("n_nationkey"))
      .select(c("c_custkey"), n("n_nationkey").as("nk"))
    assert(df.queryExecution.optimizedPlan.toString.contains("Join"))
  }

  test("reading a dim payload column disqualifies the rewrite") {
    declare()
    val c = Tables.load(spark, sf0001, "customer")
    val n = Tables.load(spark, sf0001, "nation")
    val df = c.join(n, c("c_nationkey") === n("n_nationkey"))
      .select(c("c_custkey"), n("n_name"))
    assert(df.queryExecution.optimizedPlan.toString.contains("Join"))
  }

  test("undeclared pair keeps its join") {
    JoinEliminationRule.ensure(spark)
    val o = Tables.load(spark, sf0001, "orders")
    val c = Tables.load(spark, sf0001, "customer")
    // orders→customer is a real FK but NOT declared in this spec
    val df = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(o("o_orderkey"), c("c_custkey").as("ck"))
    assert(df.queryExecution.optimizedPlan.toString.contains("Join"))
  }

  test("left outer join to the dim eliminates too") {
    declare()
    val c = Tables.load(spark, sf0001, "customer")
    val n = Tables.load(spark, sf0001, "nation")
    val df = c.join(n, c("c_nationkey") === n("n_nationkey"), "left_outer")
      .select(c("c_custkey"), n("n_nationkey").as("nk"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Join"), s"left-outer join not eliminated:\n$opt")
    // and the answer matches the executed join (filtered dim disables)
    val n2 = Tables.load(spark, sf0001, "nation").filter("n_nationkey >= 0")
    val real = c.join(n2, c("c_nationkey") === n2("n_nationkey"), "left_outer")
      .select(c("c_custkey"), n2("n_nationkey").as("nk"))
    assert(df.orderBy("c_custkey").collect().toSeq ===
      real.orderBy("c_custkey").collect().toSeq)
  }

  test("fact-side filter still eliminates (only fact rows drop)") {
    declare()
    val c = Tables.load(spark, sf0001, "customer")
      .filter("c_acctbal > 0")
    val n = Tables.load(spark, sf0001, "nation")
    val df = c.join(n, c("c_nationkey") === n("n_nationkey"))
      .select(c("c_custkey"), n("n_nationkey").as("nk"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Join"), s"join not eliminated:\n$opt")
  }
}
