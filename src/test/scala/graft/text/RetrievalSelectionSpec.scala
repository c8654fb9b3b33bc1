package graft.text

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Value-level properties of the retrieval/selection pair beyond the
  * DuckDB hash gate: q_bm25's ranked list is well-formed and only ever
  * contains docs that match the query, and q_dsir_weight's top-k is
  * ENRICHED in the target domain — the semantic point of importance
  * resampling (Xie et al. 2023): selecting by hashed-bigram likelihood
  * ratio must surface target-like docs far above the corpus base rate. */
class RetrievalSelectionSpec extends SparkSpec {

  test("q_bm25: scores positive, strictly rank-ordered, only matching docs") {
    val res = SparkEntry.queries("q_bm25")(spark, sf001).collect()
    assert(res.length === 20)
    val scores = res.map(_.getLong(1))
    assert(scores.forall(_ > 0))
    // orderBy(desc(bm25), asc(doc_id)) => non-increasing scores
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every ranked doc really contains at least one query term
    val ids = res.map(_.getLong(0)).toSet
    val matching = Tables.load(spark, sf001, "documents")
      .filter(col("text").rlike("(^| )(big|order|scan)( |$)"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(matching))
  }

  test("q_bm25: shorter doc scores higher at identical tf profile (length norm)") {
    // For any two docs with the IDENTICAL per-term tf vector over the
    // query terms, the BM25 formula is strictly decreasing in dl — so
    // the shorter doc must score >= the longer one. Verify over the
    // whole sf0.001 corpus (not just the top-20).
    val toks = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), split(col("text"), " ", -1).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("term"))
      .filter(col("term").isin("big", "order", "scan"))
      .groupBy("doc_id").agg(
        first(col("dl")).as("dl"),
        sort_array(collect_list(col("term"))).as("profile"))
    val scored = SparkEntry.queries("q_bm25")(spark, sf0001)
      .join(toks, "doc_id")
      .select(col("profile").cast("string").as("p"),
        col("dl"), col("bm25"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byProfile = scored.groupBy(_._1).filter(_._2.length >= 2)
    assert(byProfile.nonEmpty, "need at least one shared tf profile in top-20")
    byProfile.values.foreach { grp =>
      grp.toSeq.combinations(2).foreach { pair =>
        val Seq((_, dlA, sA), (_, dlB, sB)) = pair
        if (dlA < dlB) assert(sA >= sB, s"dl=$dlA scored $sA < dl=$dlB's $sB")
        if (dlB < dlA) assert(sB >= sA, s"dl=$dlB scored $sB < dl=$dlA's $sA")
      }
    }
  }

  test("q_dsir_weight: top-20 is enriched in the 'en' target domain") {
    for (sf <- Seq(sf0001, sf001)) {
      val res = SparkEntry.queries("q_dsir_weight")(spark, sf)
        .groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val enTop = res.getOrElse("en", 0L)
      // corpus base rate is ~40% en; importance resampling should put
      // >= 75% en in the top-20 (measured: 19/20 at both SFs)
      assert(enTop >= 15, s"$sf: only $enTop/20 en docs in top-20")
    }
  }

  test("q_dsir_weight: weights are length-normalized integers, ordered") {
    val res = SparkEntry.queries("q_dsir_weight")(spark, sf001).collect()
    val ws = res.map(_.getLong(3))
    assert(ws.forall(_ > 0))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
  }
}
