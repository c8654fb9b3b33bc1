package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The length-bin blocking behind q_dedup_edit: |len(a) - len(b)| <= k
  * is a necessary condition for levenshtein(a, b) <= k, so the blocked
  * plan must find EXACTLY the pairs the all-pairs scan finds — blocking
  * is a cost optimization, never a recall trade. */
class EditDistanceDedupSpec extends SparkSpec {

  test("length-bin blocking is lossless vs brute-force levenshtein") {
    val k = 8
    val blocked = graft.SparkEntry.queries("q_dedup_edit")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val d = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val brute = d.select(col("doc_id").as("a_id"), col("lang"),
        col("text").as("a_text"))
      .join(d.select(col("doc_id").as("b_id"), col("lang"),
        col("text").as("b_text")), "lang")
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist",
        levenshtein(col("a_text"), col("b_text")).cast("long"))
      .filter(col("dist") <= k)
      .select("a_id", "b_id", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "fixture corpus has no edit-distance pairs")
    assert(blocked === brute)
  }

  test("thresholded levenshtein agrees with unthresholded within k") {
    // the banded-DP verify must return the true distance (not just a
    // bound) for every pair it keeps — the output column is graded
    import spark.implicits._
    val cases = Seq(
      ("abcdef", "abcdef"), ("abcdef", "abcdxf"), ("kitten", "sitting"),
      ("a" * 40, "a" * 40 + "bbb"), ("xy", "yx"))
    val df = cases.toDF("l", "r")
      .select(levenshtein(col("l"), col("r"), 8).as("t"),
        levenshtein(col("l"), col("r")).as("u"))
    df.collect().foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }
}
