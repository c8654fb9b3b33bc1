package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BitmapDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("bitmap distinct equals countDistinct across partitionings") {
    // ids with heavy duplication, spread over different partition
    // layouts — the OR-merge must make the answer layout-independent
    val ids = (0 until 5000).map(i => (i % 7).toLong -> (i * i % 433).toLong)
    for (parts <- Seq(1, 3, 16)) {
      val df = ids.toDF("g", "id").repartition(parts)
      val got = df.groupBy("g")
        .agg(BitmapDistinctAgg.bitmapDistinct(col("id")).as("n"))
      val exp = df.groupBy("g").agg(countDistinct(col("id")).as("n"))
      assert(got.orderBy("g").collect().toSeq ===
        exp.orderBy("g").collect().toSeq, s"parts=$parts")
    }
  }

  test("global (no-group) bitmap distinct and empty input") {
    val df = (0L until 1000L).map(i => i % 250).toDF("id")
    val n = df.agg(BitmapDistinctAgg.bitmapDistinct(col("id"))).head().getLong(0)
    assert(n === 250L)
    val empty = df.filter(col("id") < 0)
      .agg(BitmapDistinctAgg.bitmapDistinct(col("id"))).head().getLong(0)
    assert(empty === 0L)
  }

  test("nulls are ignored, out-of-domain ids are rejected") {
    val withNulls = Seq(Some(1L), None, Some(1L), Some(2L)).toDF("id")
    val n = withNulls.agg(BitmapDistinctAgg.bitmapDistinct(col("id")))
      .head().getLong(0)
    assert(n === 2L)
    val bad = Seq(-1L).toDF("id")
    val e = intercept[Exception] {
      bad.agg(BitmapDistinctAgg.bitmapDistinct(col("id"))).head()
    }
    assert(e.getMessage.contains("dense domain") ||
      e.getCause != null && e.getCause.getMessage.contains("dense domain"))
  }

  test("serialization round-trips the buffer exactly") {
    val agg = BitmapDistinctAgg(
      org.apache.spark.sql.GraftSqlShims.expression(col("x")))
    val buf = agg.createAggregationBuffer()
    Seq(0, 1, 63, 64, 12345).foreach(buf.set)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back === buf)
    assert(agg.eval(back) === 5L)
  }
}
