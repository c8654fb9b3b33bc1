package graft.text

import graft.{SparkSpec, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** The two laws that make a persisted sketch table trustworthy:
  * merge-consistency (rollup of partials ≡ direct sketch) and a
  * bounded estimate error vs the exact distinct count. This is the
  * approx-sibling verification design — no SQL oracle can replay
  * Datasketches bytes, so the law itself is the gate. */
class SketchTableSpec extends SparkSpec {

  private def tokensBySource = Tables.load(spark, sf001, "documents")
    .select(col("source"), col("lang"),
      explode(tokens(col("text"))).as("tok"))

  test("union of per-(source,lang) partials equals the direct per-source sketch") {
    val dir = TextQueries.SketchTable.ensure(spark, sf001)
    val merged = spark.read.parquet(dir)
      .groupBy("source")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = tokensBySource
      .groupBy("source")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("tok"), 12)).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet === direct.keySet)
    for ((src, est) <- direct)
      assert(merged(src) === est,
        s"$src: merged ${merged(src)} != direct $est — the mergeable-" +
          "monoid law is broken")
  }

  test("estimates stay within 5% of the exact distinct vocabulary") {
    val dir = TextQueries.SketchTable.ensure(spark, sf001)
    val est = spark.read.parquet(dir)
      .groupBy("source")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = tokensBySource
      .groupBy("source").agg(countDistinct(col("tok")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, n) <- exact) {
      val e = est(src)
      assert(math.abs(e - n) <= math.max(1L, n / 20),
        s"$src: estimate $e vs exact $n exceeds 5%")
    }
  }
}
