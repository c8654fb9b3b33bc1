package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Feed-driven replication (ManifestPrune.replicateFeed): a replica
  * chain fed only the source's change feed must converge to the
  * source head ROW-EXACTLY — updates (any column), inserts, DV
  * deletes and a compaction all crossing the wire as images — while
  * staying a first-class versioned table of its own. */
class ReplicationSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  test("a replica fed the change feed converges to the source head") {
    val src = graft.Tables.matDir(s"repl_src_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, src, nFiles = 4)
    ManifestPrune.cowMergeCommit(spark, src,
      docs.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"), lit("zz").as("new_lang")),
      docs.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 20000000L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    ManifestPrune.dvDeleteCommit(spark, src,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    ManifestPrune.compactCommit(spark, src, nFiles = 2)

    val dst = graft.Tables.matDir(s"repl_dst_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, dst, nFiles = 4)
    ManifestPrune.replicateFeed(spark, src, dst, 0L, 3L)

    val srcHead = ManifestPrune.readCommitted(spark, src,
      ManifestPrune.currentVersion(spark, src))
      .orderBy("doc_id").collect().map(_.toSeq)
    val dstCur = ManifestPrune.currentVersion(spark, dst)
    // v1 lands as delete+insert commits, v2 as one delete commit,
    // the compaction step carries nothing
    assert(dstCur === 3L)
    val dstHead = ManifestPrune.readCommitted(spark, dst, dstCur)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(dstHead === srcHead)
    // and the replica is a real chain: its own compaction + vacuum
    // keep it byte-identical
    val v = ManifestPrune.compactCommit(spark, dst, nFiles = 2)
    ManifestPrune.expireVersions(spark, dst, keepLast = 1, graceMs = 0L)
    assert(ManifestPrune.readCommitted(spark, dst, v)
      .orderBy("doc_id").collect().map(_.toSeq) === srcHead)
  }
}
