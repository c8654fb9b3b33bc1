package graft.text

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The property that makes Kneser-Ney a PROBABILITY model and not just
  * a score: for every context w1, the interpolated distribution sums
  * to exactly 1 over the continuation vocabulary. In the cleared-
  * fraction integers the query uses, that is the exact identity
  *   Σ_{w2} [max(4·c12−3, 0)·B + 3·T1·L2] = 4·c1·B
  * (c12 = 0 for unseen pairs) — verified here from the raw corpus with
  * driver-side maps at sf0.001, independent of the query's joins. */
class KneserNeySpec extends SparkSpec {

  test("KN mass sums to exactly 1 per context (cleared-fraction identity)") {
    import graft.functions.GraftFunctions._
    val bigrams = graft.Tables.load(spark, sf0001, "documents")
      .select(explode(shingles(tokens(col("text")), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c12 = bigrams.map { case (bg, c) =>
      val Array(w1, w2) = bg.split(" ", 2); ((w1, w2), c)
    }
    val c1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val t1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val l2 = c12.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val b = c12.size.toLong
    for ((w1, cw1) <- c1) {
      val mass = l2.map { case (w2, lw2) =>
        val cc = c12.getOrElse((w1, w2), 0L)
        math.max(4 * cc - 3, 0L) * b + 3 * t1(w1) * lw2
      }.sum
      assert(mass === 4 * cw1 * b,
        s"context '$w1': mass $mass != ${4 * cw1 * b}")
    }
  }

  test("q_lm_kneser_ney: every doc scored; unseen-capable floor positive") {
    val rows = SparkEntry.queries("q_lm_kneser_ney")(spark, sf001).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      // even the rarest seen bigram keeps strictly positive smoothed
      // mass — the whole point of the continuation interpolation
      assert(r.getLong(3) > 0, s"doc ${r.getLong(0)} has zero-mass bigram")
      assert(r.getLong(2) >= r.getLong(1) * r.getLong(3))
    }
  }
}
