package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The contract of q_dedup_bloom: the bloom prefilter is a COST
  * optimization with the same result as the plain banded join —
  * blooms have no false negatives, and the exact hamming verify
  * removes the false positives the sketch admits. */
class BloomIncrementalSpec extends SparkSpec {

  private def expectedFromSharedPairs: Set[(Long, Long, Long)] = {
    val src = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"))
    val e = DedupQueries.sharedSimhash64Pairs(spark, sf0001)
      .join(src.select(col("doc_id").as("a_id"), col("source").as("sa")), "a_id")
      .join(src.select(col("doc_id").as("b_id"), col("source").as("sb")), "b_id")
    e.filter((col("sa") === "src0") =!= (col("sb") === "src0"))
      .select(when(col("sa") === "src0", col("b_id")).otherwise(col("a_id"))
        .as("doc_id"), col("hamming"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("hamming").as("mh"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("bloom-prefiltered result == shared-pair-table derivation") {
    val bloom = graft.SparkEntry.queries("q_dedup_bloom")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = expectedFromSharedPairs
    assert(expect.nonEmpty, "fixture corpus has no cross-history near-dups")
    assert(bloom === expect)
  }

  test("the bloom actually prunes: most non-matching probe rows drop map-side") {
    val src = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"))
    val fp = DedupQueries.persistedFingerprints(spark, sf0001)
    val plan = SimhashBanding.choose(fp.count())
    val rows = DedupQueries.bandedRows(fp, plan).join(src, "doc_id")
    val hist = rows.filter(col("source") === "src0")
    val newb = rows.filter(col("source") =!= "src0")
    val bloom = DedupQueries.buildProbeBloom(hist, hist.count())
    val total = newb.count()
    val kept = newb.filter(DedupQueries.mightContainProbe(bloom)).count()
    // ~1,900 16-bit history keys in a 2^16 space + ~1% sketch fpp:
    // a non-dup row should survive only a few percent of the time.
    // The bound is deliberately loose — the point is that the sketch
    // removes the BULK of the batch before any shuffle.
    assert(kept.toDouble / total < 0.5,
      s"bloom kept $kept of $total probe rows — not pruning")
    // no false negatives: every row of a true near-dup pair survives
    val pairIds = DedupQueries.sharedSimhash64Pairs(spark, sf0001)
      .select(explode(array(col("a_id"), col("b_id"))).as("doc_id"))
      .distinct()
    val dupNewRows = newb.join(pairIds, "doc_id")
    val dupNewKept = dupNewRows.filter(DedupQueries.mightContainProbe(bloom))
    // (a near-dup's partner may be in the new batch rather than
    // history, so not every row must hit — but every HISTORY-matched
    // row must. Check via the end-to-end equality above; here assert
    // the filter at least keeps every row whose exact (comb, bits)
    // key exists in history.)
    val histKeys = hist.select("comb", "bits").distinct()
    val mustKeep = newb.join(histKeys, Seq("comb", "bits")).count()
    val mustKept = newb.join(histKeys, Seq("comb", "bits"))
      .filter(DedupQueries.mightContainProbe(bloom)).count()
    assert(mustKeep === mustKept, "bloom dropped a true-key row")
    assert(dupNewRows.count() >= dupNewKept.count()) // sanity, not a bound
  }
}
