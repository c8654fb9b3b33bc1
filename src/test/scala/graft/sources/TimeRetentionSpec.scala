package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** expireVersions' time floor (`olderThanMs`, Iceberg
  * expire_snapshots(older_than, retain_last) semantics): a version is
  * expired only if it is BOTH beyond keepLast AND committed
  * at-or-before olderThanMs — so a deployment can promise "any reader
  * or time-travel within the last H hours succeeds" independently of
  * commit rate, which count-based retention cannot. */
class TimeRetentionSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  private def chain(): (String, Long, Long) = {
    val root = graft.Tables.matDir(s"retain_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    val v1 = ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 19 === 7).select("doc_id"))
    Thread.sleep(15)
    val v2 = ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 23 === 5).select("doc_id"))
    (root, ManifestPrune.commitTimeMs(root, v1).get,
      ManifestPrune.commitTimeMs(root, v2).get)
  }

  test("a version younger than the time floor survives keepLast") {
    val (root, t1, _) = chain()
    // olderThan BEFORE v1's commit: v1 and v2 are both too young to
    // expire even though keepLast=1 would drop v1 (and v0)
    val stats = ManifestPrune.expireVersions(spark, root,
      keepLast = 1, graceMs = 0L, olderThanMs = t1 - 1)
    assert(stats.keptVersions === Seq(1L, 2L))
    assert(new java.io.File(ManifestPrune.manifestOf(root, 1L))
      .isDirectory)
    // v0 (base) WAS committed before the floor and beyond keepLast
    assert(!new java.io.File(ManifestPrune.manifestOf(root, 0L))
      .isDirectory)
    // v1 still reads exactly
    assert(ManifestPrune.readCommitted(spark, root, 1L).count() ===
      docs.filter(col("doc_id") % 19 =!= 7).count())
    // time travel to t1 still works — the promise the floor buys
    assert(ManifestPrune.versionAsOf(spark, root, t1) === 1L)
  }

  test("with the floor in the future, retention degrades to keepLast") {
    val (root, _, t2) = chain()
    val stats = ManifestPrune.expireVersions(spark, root,
      keepLast = 1, graceMs = 0L, olderThanMs = t2 + 60000)
    assert(stats.keptVersions === Seq(2L))
    assert(!new java.io.File(ManifestPrune.manifestOf(root, 1L))
      .isDirectory)
    assert(ManifestPrune.readCommitted(spark, root, 2L).count() ===
      docs.filter(col("doc_id") % 19 =!= 7 &&
        col("doc_id") % 23 =!= 5).count())
  }
}
