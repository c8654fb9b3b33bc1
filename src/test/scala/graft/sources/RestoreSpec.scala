package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** RESTORE on the version chain: rollback is a normal auditable
  * commit (a byte-copy of the target's manifest published as the next
  * version), reads byte-identically to the target, carries the
  * target's deletion vectors, and survives the target's own expiry —
  * the shared-sidecar case the expiry reachability rule must respect. */
class RestoreSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")
  private val MP = ManifestPrune

  private def freshRoot(tag: String): String = {
    val root = graft.Tables.matDir(s"restore_${tag}_${System.nanoTime}",
      spark, sf0001)
    MP.buildLayout(docs, root, nFiles = 4)
    root
  }

  test("restore publishes an older state as the new head and keeps " +
    "the bad versions readable") {
    val root = freshRoot("roll")
    MP.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 7 === 2).select("doc_id"))
    val v1 = MP.readCommitted(spark, root, 1L)
      .orderBy("doc_id").collect().map(_.toSeq)
    // the "bad" commit to roll back
    MP.mergeIntoCommit(spark, root,
      docs.filter(col("doc_id") % 5 === 1)
        .select(col("doc_id"), lit("bad").as("lang")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    val v3 = MP.restoreVersion(spark, root, 1L)
    assert(v3 === 3L)
    assert(MP.commitNote(root, v3) === Some("restore:1"))
    // head == v1 exactly, DVs carried (the %7 deletes stay hidden)
    val head = MP.readCommitted(spark, root, v3)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(head === v1)
    // history is not rewritten: the bad version still reads
    assert(MP.readCommitted(spark, root, 2L)
      .filter(col("lang") === "bad").count() > 0L)
  }

  test("restored head survives expiry of its source version — the " +
    "shared sidecar is retained while any kept version references it") {
    val root = freshRoot("expire")
    MP.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 7 === 2).select("doc_id"))
    MP.mergeIntoCommit(spark, root,
      docs.filter(col("doc_id") % 5 === 1)
        .select(col("doc_id"), lit("bad").as("lang")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    val v3 = MP.restoreVersion(spark, root, 1L)
    val before = MP.readCommitted(spark, root, v3)
      .orderBy("doc_id").collect().map(_.toSeq)
    // expire everything but the restored head — including v1, whose
    // sidecar the head shares
    MP.expireVersions(spark, root, keepLast = 1, graceMs = 0)
    assert(MP.dvOf(root, v3).isDefined)
    val after = MP.readCommitted(spark, root, v3)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(after === before)
    // and restoring the now-expired version fails cleanly
    MP.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") === 11).select("doc_id"))
    val e = intercept[IllegalArgumentException] {
      MP.restoreVersion(spark, root, 2L)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("restore refuses the current head and future versions") {
    val root = freshRoot("arg")
    MP.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") === 3).select("doc_id"))
    val e = intercept[IllegalArgumentException] {
      MP.restoreVersion(spark, root, 1L)
    }
    assert(e.getMessage.contains("older version"))
  }
}
