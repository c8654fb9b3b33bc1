package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pointer doubling must reproduce true recursion on shapes deeper
  * than the battery's shallow heap tree — the chain is the worst case
  * (depth = n-1), where the log-round guarantee matters most. */
class PointerDoublingSpec extends SparkSpec {

  test("chain of 100 resolves in ceil(log2 99) = 7 rounds, not 99") {
    import spark.implicits._
    val n = 100
    val state0 = (0L until n.toLong).toDF("id").select(
      col("id"),
      when(col("id") === 0, col("id")).otherwise(col("id") - 1).as("anc"),
      when(col("id") === 0, lit(0L)).otherwise(lit(1L)).as("steps"))
    val out = PointerDoubling.resolve(state0, rounds = 7)
      .select("id", "anc", "steps").collect()
    assert(out.length === n)
    for (r <- out) {
      assert(r.getLong(1) === 0L, s"node ${r.getLong(0)} not at root")
      assert(r.getLong(2) === r.getLong(0),
        s"node ${r.getLong(0)} depth ${r.getLong(2)}")
    }
  }

  test("surplus rounds are no-ops (converged rows are fixpoints)") {
    import spark.implicits._
    val state0 = (0L until 16L).toDF("id").select(
      col("id"),
      when(col("id") === 0, col("id"))
        .otherwise(expr("(id - 1) div 2")).as("anc"),
      when(col("id") === 0, lit(0L)).otherwise(lit(1L)).as("steps"))
    val at4 = PointerDoubling.resolve(state0, rounds = 4)
      .orderBy("id").collect().toSeq
    val at8 = PointerDoubling.resolve(state0, rounds = 8)
      .orderBy("id").collect().toSeq
    assert(at4 === at8)
  }
}
