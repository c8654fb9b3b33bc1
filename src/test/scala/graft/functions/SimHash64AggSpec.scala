package graft.functions

import graft.{SparkSpec, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

class SimHash64AggSpec extends SparkSpec {

  /** The 65-buffer expression formulation the aggregate replaced (and
    * the one the DuckDB oracle still spells out) — kept here as the
    * equivalence baseline. */
  private def expressionFingerprints = {
    val toks = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), explode(tokenSet(col("text"))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val withNibbles = (0 until 16).foldLeft(toks) { (df, j) =>
      df.withColumn(s"nib$j",
        expr(s"instr('0123456789abcdef', substr(h, ${j + 1}, 1)) - 1"))
    }
    val votes = withNibbles.groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        (0 until 64).map { k =>
          val (j, b) = (k / 4, k % 4)
          sum(when(col(s"nib$j") % (1L << (b + 1)) >= (1L << b), 1L)
            .otherwise(0L)).as(s"c$k")
        }: _*)
    def half(bits: Range): org.apache.spark.sql.Column = bits.map { k =>
      when(col(s"c$k") * 2 >= col("n"), lit(1L << (k % 32)))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    votes.select(col("doc_id"),
      half(32 until 64).as("hi"), half(0 until 32).as("lo"))
  }

  private def aggFingerprints =
    Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), explode(tokenSet(col("text"))).as("tok"))
      .groupBy("doc_id")
      .agg(SimHash64Agg.simhash64(md5(col("tok"))).as("fp"))
      .select(col("doc_id"), col("fp.hi").as("hi"), col("fp.lo").as("lo"))

  test("aggregate fingerprints == expression-formulation fingerprints") {
    val a = aggFingerprints.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val e = expressionFingerprints.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a.nonEmpty)
    assert(a === e)
  }

  test("halves are non-negative 32-bit values (cross-engine BIGINT safe)") {
    aggFingerprints.collect().foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 0xFFFFFFFFL)
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 0xFFFFFFFFL)
    }
  }

  test("partial aggregation plans (map-side combine before the shuffle)") {
    val plan = aggFingerprints.queryExecution.executedPlan.toString
    assert(plan.contains("partial_simhash64"), plan)
    assert(plan.contains("simhash64"), plan)
  }

  test("null inputs are ignored, not voted") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (1L, None), (1L, Some("b")))
      .toDF("g", "t")
      .groupBy("g")
      .agg(SimHash64Agg.simhash64(md5(col("t"))).as("fp"))
      .select(col("fp.hi"), col("fp.lo"))
    val withNull = df.collect()(0)
    val without = Seq((1L, "a"), (1L, "b")).toDF("g", "t")
      .groupBy("g")
      .agg(SimHash64Agg.simhash64(md5(col("t"))).as("fp"))
      .select(col("fp.hi"), col("fp.lo")).collect()(0)
    assert(withNull.getLong(0) === without.getLong(0))
    assert(withNull.getLong(1) === without.getLong(1))
  }
}
