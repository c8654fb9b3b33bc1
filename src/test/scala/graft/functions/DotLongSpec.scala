package graft.functions

import graft.SparkSpec
import graft.functions.DotLong.dot_long
import org.apache.spark.sql.functions._

class DotLongSpec extends SparkSpec {
  import spark.implicits._

  test("known values, mismatched lengths, nulls, overflow wrap") {
    val df = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
    assert(df.select(dot_long(col("a"), col("b"))).head().getLong(0) === 32L)

    val mismatch = Seq((Array(1L), Array(1L, 2L))).toDF("a", "b")
      .select(dot_long(col("a"), col("b"))).head()
    assert(mismatch.isNullAt(0))

    val withNull = Seq((Some(Array(1L)), Option.empty[Array[Long]]))
      .toDF("a", "b").select(dot_long(col("a"), col("b"))).head()
    assert(withNull.isNullAt(0))

    // overflow wraps like Java (NOTE: the HOF formulation under ANSI
    // mode throws ARITHMETIC_OVERFLOW instead — scaled embeddings stay
    // below 1e15 so neither path is ever exercised in the queries)
    val big = Seq((Array(Long.MaxValue, 2L), Array(2L, 3L))).toDF("a", "b")
    val native = big.select(dot_long(col("a"), col("b"))).head().getLong(0)
    assert(native === Long.MaxValue * 2L + 6L) // wrapped, Java semantics
  }

  test("agrees with the HOF dot product on real scaled embeddings") {
    import graft.functions.GraftFunctions.vecScaled
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(100)
      .select(vecScaled(col("embedding")).as("sv"))
    val both = e.select(
      dot_long(col("sv"), col("sv")).as("native"),
      aggregate(zip_with(col("sv"), col("sv"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("hof")).collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }
}
