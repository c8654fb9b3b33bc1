package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RangeJoinRewriteRule: the abs-difference theta join must rewrite to
  * the 3-bin equi-join losslessly — same rows as the naive plan on
  * adversarial data (negative values, zero-bucket straddles, exact-w
  * gaps) — and must NOT fire where an equi key already exists. */
class RangeJoinRuleSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.{Row, types => T}

  private def df(name: String, vs: Seq[Long]) = {
    val schema = T.StructType(Seq(
      T.StructField(name + "_id", T.LongType, nullable = false),
      T.StructField(name + "_v", T.LongType, nullable = false)))
    spark.createDataFrame(
      vs.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }.asJava, schema)
  }

  test("rewrite is lossless on sign-straddling data (property sweep)") {
    RangeJoinRewriteRule.enable(spark)
    val rnd = new scala.util.Random(42)
    // values dense around 0 and at bucket edges, both signs, plus
    // far-flung magnitudes double-rounding would mis-bin
    val vals = Seq.tabulate(120)(_ => rnd.between(-250L, 250L)) ++
      Seq(-101L, -100L, -99L, -1L, 0L, 1L, 99L, 100L, 101L,
        1000000000000L, 1000000000099L, -1000000000000L)
    for (w <- Seq(1L, 7L, 100L)) {
      val bVals = rnd.shuffle(vals)
      val a = df("a", vals)
      val b = df("b", bVals)
      val got = a.join(b, abs(col("a_v") - col("b_v")) <= lit(w))
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val expect = for {
        (x, i) <- vals.zipWithIndex
        (y, j) <- bVals.zipWithIndex
        if math.abs(x - y) <= w
      } yield (i.toLong, j.toLong)
      assert(got.toSet === expect.toSet, s"w=$w: rewrite changed the result")
      assert(got.length === expect.length, s"w=$w: duplicate matches")
    }
  }

  test("optimized plan bins and equi-joins (no nested-loop join)") {
    RangeJoinRewriteRule.enable(spark)
    val a = df("a", Seq.tabulate(50)(_.toLong))
    val b = df("b", Seq.tabulate(50)(i => (i * 3).toLong))
    val j = a.join(b, abs(col("a_v") - col("b_v")) <= lit(5L))
    val opt = j.queryExecution.optimizedPlan.toString
    assert(opt.contains("__range_bin"), s"rule did not fire:\n$opt")
    assert(opt.contains("explode"), s"no 3-bin explode:\n$opt")
    val phys = j.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") &&
      !phys.contains("CartesianProduct"),
      s"still a nested-loop join:\n$phys")
  }

  test("user broadcast hint survives the rewrite") {
    RangeJoinRewriteRule.enable(spark)
    val a = df("a", Seq.tabulate(50)(_.toLong))
    val b = df("b", Seq.tabulate(50)(i => (i * 3).toLong))
    // auto-broadcast off: only the user's hint can pick a broadcast
    // join, so its presence in the physical plan proves propagation
    withThreshold("-1") {
      val hinted = a.join(broadcast(b),
        abs(col("a_v") - col("b_v")) <= lit(5L))
      val opt = hinted.queryExecution.optimizedPlan.toString
      assert(opt.contains("__range_bin"), s"rule did not fire:\n$opt")
      val phys = hinted.queryExecution.executedPlan.toString
      assert(phys.contains("BroadcastHashJoin"),
        s"broadcast hint dropped by the rewrite:\n$phys")
      val plain = a.join(b, abs(col("a_v") - col("b_v")) <= lit(5L))
      assert(!plain.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "control: unhinted plan should not broadcast at threshold -1")
      assert(hinted.count() === plain.count())
    }
  }

  private def withThreshold(v: String)(body: => Unit): Unit = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, v)
    try body finally spark.conf.set(key, old)
  }

  test("does not fire when an equi key already joins the sides") {
    RangeJoinRewriteRule.enable(spark)
    val a = df("a", Seq.tabulate(20)(_.toLong))
    val b = df("b", Seq.tabulate(20)(_.toLong))
    val j = a.join(b, col("a_id") === col("b_id") &&
      abs(col("a_v") - col("b_v")) <= lit(5L))
    assert(!j.queryExecution.optimizedPlan.toString.contains("__range_bin"))
  }

  test("does not fire on non-inner joins") {
    RangeJoinRewriteRule.enable(spark)
    val a = df("a", Seq.tabulate(20)(_.toLong))
    val b = df("b", Seq.tabulate(20)(i => (i * 2).toLong))
    val j = a.join(b, abs(col("a_v") - col("b_v")) <= lit(5L), "left")
    assert(!j.queryExecution.optimizedPlan.toString.contains("__range_bin"))
    // and the left join still answers correctly through the BNLJ path
    assert(j.count() >= a.count())
  }
}
