package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two-phase global-rank scaffold must produce EXACT contiguous
  * ranks however often Spark re-executes the frame — the property the
  * sf1 oracle rung caught repartitionByRange losing (its imbalance
  * resample seed is execution-dependent, so the offsets branch and
  * the ranking branch could disagree on boundaries; duplicate ids). */
class GlobalRankSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"$sf0001/documents.parquet")

  test("withRank numbers the corpus 1..n with no gaps or duplicates") {
    val n = docs.count()
    val ranked = GlobalRank.withRank(docs.select("doc_id"), 8,
      col("doc_id"), Seq(col("doc_id")), "rid", n)
    val rids = ranked.select("rid").collect().map(_.getLong(0)).sorted
    assert(rids.toSeq === (1L to n).toSeq)
  }

  test("withRank matches the single-window oracle rank") {
    import org.apache.spark.sql.expressions.Window
    val n = docs.count()
    val got = GlobalRank.withRank(docs.select("doc_id", "source"), 8,
        col("doc_id"), Seq(col("doc_id")), "rid", n)
      .select("doc_id", "rid")
    val exp = docs.select(col("doc_id"),
      row_number().over(Window.orderBy("doc_id"))
        .cast("long").as("rid"))
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }

  test("string-prefix bucketing ranks by the FULL key order") {
    import org.apache.spark.sql.expressions.Window
    val n = docs.count()
    val got = GlobalRank.withRank(docs.select("doc_id", "text"), 8,
        substring(col("text"), 1, 16),
        Seq(col("text"), col("doc_id")), "rk", n)
      .select("doc_id", "rk")
    val exp = docs.select(col("doc_id"),
      row_number().over(Window.orderBy("text", "doc_id"))
        .cast("long").as("rk"))
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }

  test("bucket assignment is identical across re-executions") {
    // the consistency contract: __bkt is a pure function of the row.
    // Execute the SAME bucketed frame twice (two separate actions, so
    // the exchange re-runs) and require identical (doc_id, __bkt).
    val b = GlobalRank.bucketed(docs.select("doc_id"), 8,
      col("doc_id"), docs.count())
    val run1 = b.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val run2 = b.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(run1 === run2)
  }

  test("offsets prefix-sums an arbitrary aggregate exclusively") {
    val b = GlobalRank.bucketed(docs.select("doc_id", "n_chars"), 8,
      col("doc_id"), docs.count())
    val offs = GlobalRank.offsets(b, sum(col("n_chars")))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // bucket 0's exclusive prefix is 0; every bucket's offset equals
    // the sum of n_chars over all strictly-smaller buckets
    val perBucket = b.groupBy("__bkt").agg(sum("n_chars").as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    offs.foreach { case (bkt, off) =>
      val want = perBucket.filter(_._1 < bkt).values.sum
      assert(off === want, s"bucket $bkt")
    }
  }
}
