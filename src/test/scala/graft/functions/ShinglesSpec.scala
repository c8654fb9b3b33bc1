package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-16 shingles() rewrite (zip_with over w aligned slices
  * instead of transform-over-sequence with the token array inside the
  * lambda) must be value-identical to the spec definition: shingle i =
  * tokens[i..i+w-1] joined by single spaces, i in 1..n-w+1, empty
  * array when n < w. The lambda form re-evaluated an inline tokenizer
  * once per shingle position (quadratic per row) — a cost change only;
  * this spec pins that the VALUES never moved. */
class ShinglesSpec extends SparkSpec {

  private def reference(toks: Seq[String], w: Int): Seq[String] =
    if (toks.length < w) Seq.empty
    else toks.sliding(w).filter(_.length == w).map(_.mkString(" ")).toSeq

  test("shingles == sliding-window reference, w = 2 and 3, edge cases") {
    val rows = Seq(
      "a b c d e",      // normal
      "a b",            // n == w for w=2, n < w for w=3
      "a",              // n < w for both
      "",               // split("", -1) -> [""] — one empty token
      "x y x y x",      // repeats
      "aa  bb",         // double space -> empty middle token (limit -1)
      (1 to 40).map(i => s"t$i").mkString(" ")) // longer doc
    val df = spark.createDataFrame(rows.map(Tuple1(_))).toDF("text")
    for (w <- Seq(2, 3)) {
      val got = df
        .select(col("text"), GraftFunctions.shingles(
          GraftFunctions.tokens(col("text")), w).as("sh"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[String](1))
        .toMap
      for (text <- rows) {
        val toks = text.split(" ", -1).toSeq
        assert(got(text) === reference(toks, w),
          s"w=$w text='$text'")
      }
    }
  }

  test("shingles stays empty-array (not null) on short inputs") {
    val df = spark.createDataFrame(Seq(Tuple1("solo"))).toDF("text")
    val r = df.select(GraftFunctions.shingles(
      GraftFunctions.tokens(col("text")), 2).as("sh")).head()
    assert(!r.isNullAt(0) && r.getSeq[String](0).isEmpty)
  }
}
