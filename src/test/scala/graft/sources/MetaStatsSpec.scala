package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The q_meta_stats contract made literal: COUNT and min/max bounds
  * are answered from manifests + sidecars ALONE. The proof is
  * destructive — delete every data file and ask again; a metadata
  * path cannot notice, a scan path cannot survive. */
class MetaStatsSpec extends SparkSpec {

  test("live count and bounds survive the data files' deletion") {
    val docs = Tables.load(spark, sf0001, "documents")
    val root = Tables.matDir(s"metastats_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 9 === 5).select("doc_id"))
    val expectLive = docs.filter(col("doc_id") % 9 =!= 5).count()
    val Array(loEx, hiEx) = docs
      .agg(min("n_chars"), max("n_chars")).collect()
      .flatMap(r => Array(r.getLong(0), r.getLong(1)))
    def ask(): (Long, Long, Long) = {
      val n = ManifestPrune.liveRowCountCommitted(spark, root, 1L)
      val b = spark.read.parquet(ManifestPrune.manifestOf(root, 1L))
        .agg(min("min_key"), max("max_key")).collect().head
      (n, b.getLong(0), b.getLong(1))
    }
    assert(ask() === ((expectLive, loEx, hiEx)))
    // burn the data — the metadata path must not notice
    new java.io.File(s"$root/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).foreach(_.delete())
    assert(ask() === ((expectLive, loEx, hiEx)))
  }
}
