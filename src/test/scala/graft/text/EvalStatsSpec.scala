package graft.text

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Value-level checks of the evaluation statistics beyond the DuckDB
  * hash gate: the rank-formula AUC must equal the DEFINITION of AUC
  * (pairwise pos-vs-neg comparison), and the HHI/effective-vocabulary
  * numbers must satisfy their analytic bounds. */
class EvalStatsSpec extends SparkSpec {

  test("q_classifier_auc matches brute-force pairwise AUC (definition)") {
    // recompute per-doc (label, logit) exactly as the query does, then
    // count pairs directly: 2U = 2*#(pos>neg) + #(pos==neg)
    import graft.functions.GraftFunctions.tokens
    val scored = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("tok"))
      .withColumn("b", pmod(conv(substring(md5(col("tok")), 1, 8), 16, 10)
        .cast("long"), lit(64L)))
      .groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("f"))
      .withColumn("w", pmod(conv(substring(md5(col("b").cast("string")),
        1, 1), 16, 10).cast("long"), lit(5L)) - 2L)
      .groupBy("doc_id", "lang").agg(sum(col("f") * col("w")).as("logit"))
      .collect().map(r => (r.getString(1) == "en", r.getLong(2)))
    val pos = scored.filter(_._1).map(_._2)
    val neg = scored.filterNot(_._1).map(_._2)
    var u2 = 0L
    for (p <- pos; n <- neg) {
      if (p > n) u2 += 2L else if (p == n) u2 += 1L
    }
    val row = SparkEntry.queries("q_classifier_auc")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) === pos.length.toLong)
    assert(row.getLong(1) === neg.length.toLong)
    assert(row.getLong(2) === u2)
    val auc = row.getDouble(3)
    assert(auc === u2.toDouble / (2.0 * pos.length * neg.length))
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("q_calibration: bins partition the corpus; rates are exact ppm") {
    val rows = SparkEntry.queries("q_calibration")(spark, sf001).collect()
    assert(rows.length >= 4, "bin width too coarse to diagnose anything")
    val (n, nPos) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    // every doc lands in exactly one bin; positives = the en subset
    assert(n === 500L)
    val enDocs = graft.Tables.load(spark, sf001, "documents")
      .filter(col("lang") === "en").count()
    assert(nPos === enDocs)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) === 1000000L * r.getLong(2) / r.getLong(1))
    }
  }

  test("q_bootstrap_ci: intervals bracket sanely and weights are Poisson-ish") {
    val rows = SparkEntry.queries("q_bootstrap_ci")(spark, sf001).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (mean, nReps, lo, hi) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nReps === 32L, "a replicate lost all its weight at n=25 docs")
      assert(lo <= hi)
      // the CI must bracket a neighborhood of the point estimate: the
      // order stats are means of ~same-sized resamples of the same
      // rows, so the interval straddles the mean
      assert(lo <= mean && mean <= hi,
        s"${r.getString(0)}: CI [$lo, $hi] misses the mean $mean")
      // and it is a genuine interval, not collapsed to a point
      assert(hi > lo, s"${r.getString(0)}: degenerate CI")
    }
    // Poisson(1) mass check on the deterministic weights: over all
    // (doc, rep) draws, the w=0 fraction must sit near e^-1
    import org.apache.spark.sql.functions._
    val draws = graft.Tables.load(spark, sf001, "documents")
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(31))).as("rep"))
      .withColumn("b", pmod(conv(substring(md5(concat(
        col("doc_id").cast("string"), lit("_"),
        col("rep").cast("string"))), 1, 8), 16, 10)
        .cast("long"), lit(1000000L)))
      .withColumn("z", (col("b") < 367879L).cast("int"))
      .agg(avg(col("z"))).collect().head.getDouble(0)
    assert(math.abs(draws - math.exp(-1)) < 0.01,
      s"w=0 mass $draws far from e^-1")
  }

  test("q_hhi_diversity: analytic bounds hold per source") {
    val rows = SparkEntry.queries("q_hhi_diversity")(spark, sf001).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (nTok, nVocab, sumSq) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      val (hhi, eff) = (r.getLong(4), r.getLong(5))
      // Cauchy-Schwarz: n_tokens^2 / n_vocab <= sum_sq <= n_tokens^2
      assert(sumSq * nVocab >= nTok * nTok)
      assert(sumSq <= nTok * nTok)
      // => 1 <= eff_vocab <= n_vocab, and hhi in [1e6/n_vocab, 1e6]
      assert(eff >= 1L && eff <= nVocab)
      assert(hhi >= 1000000L / nVocab - 1 && hhi <= 1000000L)
      // the two integer quotients are floor-consistent inverses
      assert(eff === (nTok * nTok) / sumSq)
    }
  }
}
