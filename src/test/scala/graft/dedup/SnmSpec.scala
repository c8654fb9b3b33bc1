package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_dedup_snm's machinery contract: the scale formulation (two-phase
  * global rank + range-join bins on the rank axis) must produce
  * exactly the pairs of the naive formulation (one global window,
  * direct rank-difference theta join) — the distribution strategy is
  * a cost choice, never a result choice. */
class SnmSpec extends SparkSpec {

  test("two-phase SNM == naive single-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val w = 10
    val k = 48
    val got = graft.SparkEntry.queries("q_dedup_snm")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ranked = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("rk",
        row_number().over(Window.orderBy("text", "doc_id")).cast("long"))
    val a = ranked.select(col("doc_id").as("a_doc"),
      col("text").as("a_text"), col("rk").as("a_rk"))
    val b = ranked.select(col("doc_id").as("b_doc"),
      col("text").as("b_text"), col("rk").as("b_rk"))
    val naive = a.join(b,
        col("b_rk") > col("a_rk") && col("b_rk") <= col("a_rk") + w)
      .withColumn("dist",
        levenshtein(col("a_text"), col("b_text"), k).cast("long"))
      .filter(col("dist") >= 0)
      .select(least(col("a_doc"), col("b_doc")).as("a_id"),
        greatest(col("a_doc"), col("b_doc")).as("b_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(naive.nonEmpty, "fixture corpus yields no SNM pairs")
    assert(got === naive)
  }
}
