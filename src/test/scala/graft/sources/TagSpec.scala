package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Named tags over the version chain (Iceberg refs) and their
  * retention-anchor contract: a tagged version survives ANY expiry
  * (keepLast and the time floor both), reads stably by name, and
  * resumes normal retention once the tag is deleted. */
class TagSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  private def chain(): String = {
    val root = graft.Tables.matDir(s"tag_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 19 === 7).select("doc_id"))
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 23 === 5).select("doc_id"))
    root
  }

  test("a tagged version is a retention anchor: survives expiry, " +
    "reads by name, expires after untagging") {
    val root = chain()
    ManifestPrune.tagVersion(root, "train-v1", 1L)
    assert(ManifestPrune.taggedVersion(root, "train-v1") === Some(1L))
    val stats = ManifestPrune.expireVersions(spark, root,
      keepLast = 1, graceMs = 0L)
    // v1 kept by the tag, v0 expired, head kept by count
    assert(stats.keptVersions === Seq(1L, 2L))
    assert(!new java.io.File(ManifestPrune.manifestOf(root, 0L))
      .isDirectory)
    val expected = docs.filter(col("doc_id") % 19 =!= 7)
    assert(ManifestPrune.readTagged(spark, root, "train-v1")
      .count() === expected.count())
    // the DV sidecar the tagged version needs survived too
    assert(ManifestPrune.dvOf(root, 1L).isDefined)
    // untag → the anchor is gone, normal retention resumes
    assert(ManifestPrune.deleteTag(root, "train-v1"))
    ManifestPrune.expireVersions(spark, root, keepLast = 1, graceMs = 0L)
    assert(!new java.io.File(ManifestPrune.manifestOf(root, 1L))
      .isDirectory)
    intercept[IllegalArgumentException] {
      ManifestPrune.readTagged(spark, root, "train-v1")
    }
    // head still exact
    assert(ManifestPrune.readCommitted(spark, root, 2L).count() ===
      docs.filter(col("doc_id") % 19 =!= 7 &&
        col("doc_id") % 23 =!= 5).count())
  }

  test("tags are immutable and only committed, readable versions " +
    "can be tagged") {
    val root = chain()
    ManifestPrune.tagVersion(root, "t", 2L)
    intercept[IllegalArgumentException] {
      ManifestPrune.tagVersion(root, "t", 1L) // name taken
    }
    intercept[IllegalArgumentException] {
      ManifestPrune.tagVersion(root, "future", 9L) // never committed
    }
    intercept[IllegalArgumentException] {
      ManifestPrune.tagVersion(root, "bad name", 1L) // invalid chars
    }
    assert(ManifestPrune.listTags(root) === Map("t" -> 2L))
    // a tag on an expired version is refused (nothing left to read)
    ManifestPrune.expireVersions(spark, root, keepLast = 1, graceMs = 0L)
    intercept[IllegalArgumentException] {
      ManifestPrune.tagVersion(root, "late", 0L)
    }
  }
}
