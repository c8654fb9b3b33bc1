package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic invariants for the index/layout/evaluation operators —
  * properties the DuckDB hash gate can't express (it proves both
  * engines agree; these prove the agreed answer has the right SHAPE).
  */
class CorpusOpsSpec extends SparkSpec {

  test("q_inverted_index: postings capped at 10, df/cf consistent") {
    val idx = SparkEntry.queries("q_inverted_index")(spark, sf001).cache()
    val bad = idx.filter(
      size(split(col("postings"), ",")) > 10 ||
      size(split(col("postings"), ",")) > col("df") ||
      col("cf") < col("df")).count()
    assert(bad === 0)
    // df summed over terms == total (term, doc) incidences
    val totalDf = idx.agg(sum("df")).head.getLong(0)
    val expected = graft.Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), explode(graft.functions.GraftFunctions
        .tokenSet(col("text"))).as("t"))
      .count()
    assert(totalDf === expected)
    idx.unpersist()
  }

  test("q_shard_balance: doc counts within 1, full corpus covered") {
    val sh = SparkEntry.queries("q_shard_balance")(spark, sf001).cache()
    assert(sh.count() === 8)
    val counts = sh.select("n_docs").collect().map(_.getLong(0))
    assert(counts.max - counts.min <= 1,
      s"round-robin must balance doc counts: ${counts.mkString(",")}")
    val total = counts.sum
    val nDocs = graft.Tables.load(spark, sf001, "documents").count()
    assert(total === nDocs, "every document lands in exactly one shard")
    // size-sorted round-robin keeps token mass near-equal: the spread
    // is bounded by one max-sized doc per shard; assert a loose 20%
    val toks = sh.select("n_tokens").collect().map(_.getLong(0))
    assert(toks.max <= toks.min * 1.2,
      s"token mass skewed: ${toks.mkString(",")}")
    sh.unpersist()
  }

  test("q_graph_degree: degree-sum identity (sum deg*n = 2 * edges)") {
    val gd = SparkEntry.queries("q_graph_degree")(spark, sf001)
    val degSum = gd.agg(sum(col("deg") * col("n_nodes"))).head.getLong(0)
    val pairs = SparkEntry.queries("q_dedup_simhash64")(spark, sf001).count()
    assert(degSum === 2 * pairs)
  }

  test("q_ann_recall: 5 queries, hits in [0,5], recall = hits/5") {
    val r = SparkEntry.queries("q_ann_recall")(spark, sf001).cache()
    assert(r.count() === 5)
    val bad = r.filter(col("n_hits") < 0 || col("n_hits") > 5 ||
      col("recall") =!= col("n_hits").cast("double") / 5.0).count()
    assert(bad === 0)
    // the probed IVF path must find at least SOME of the exact top-5
    // overall (nProbe=2 of 8 lists; zero everywhere would mean the
    // probe ranking or index layout broke)
    assert(r.agg(sum("n_hits")).head.getLong(0) > 0)
    r.unpersist()
  }
}
