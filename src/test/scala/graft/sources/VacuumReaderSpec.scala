package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The retention contract under concurrent readers — the operational
  * question every VACUUM user asks first: a reader holding a version
  * open while expiry destroys it must fail CLEANLY (resolution error
  * or missing-file read error), never return a silently wrong or
  * partial result. Expiry destroys only files unreachable from every
  * KEPT version, so the failure surface is exactly (a) resolving an
  * expired version and (b) executing a plan whose file list was
  * captured before the expiry; both are pinned here. `keepLast` is
  * the knob: size it to cover the longest reader/travel window, the
  * same contract as Iceberg's expire_snapshots retention. */
class VacuumReaderSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  /** base layout → DV delete (v1) → compaction (v2, rewrites every
    * data file, so v0/v1's files become head-unreachable). */
  private def chain(): String = {
    val root = graft.Tables.matDir(s"vacrd_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 19 === 7).select("doc_id"))
    ManifestPrune.compactCommit(spark, root, nFiles = 2)
    root
  }

  test("resolving an expired version after vacuum fails cleanly") {
    val root = chain()
    ManifestPrune.expireVersions(spark, root, keepLast = 1, graceMs = 0L)
    // metadata of v1 is gone: a fresh read attempt must error at
    // resolution/manifest time, not fabricate rows
    val e = intercept[Throwable] {
      ManifestPrune.readCommitted(spark, root, 1L).count()
    }
    val msg = Option(e.getMessage).getOrElse("")
    assert(msg.contains("PATH_NOT_FOUND") || msg.contains("manifest") ||
      msg.toLowerCase.contains("not exist"), s"unexpected error: $msg")
    // the kept head still reads, and reads RIGHT
    val head = ManifestPrune.readCommitted(spark, root,
      ManifestPrune.currentVersion(spark, root))
    assert(head.count() === docs.filter(col("doc_id") % 19 =!= 7).count())
  }

  test("a reader whose plan predates the vacuum fails on execution, " +
    "never silently drops the destroyed files' rows") {
    val root = chain()
    // reader opens v1 BEFORE expiry: the manifest is consulted now,
    // so the plan carries concrete (soon-to-be-destroyed) file paths
    val preOpened = ManifestPrune.readCommitted(spark, root, 1L)
    val expectRows = docs.filter(col("doc_id") % 19 =!= 7).count()
    assert(preOpened.count() === expectRows) // sane while v1 lives
    ManifestPrune.expireVersions(spark, root, keepLast = 1, graceMs = 0L)
    // v1's data files are unreachable from the kept head (compaction
    // rewrote all of them) and are now deleted: executing the
    // pre-expiry plan must THROW (ignoreMissingFiles stays false),
    // not return fewer rows
    val e = intercept[Throwable] {
      val n = preOpened.count()
      assert(n === expectRows,
        s"silent wrong read: $n rows after vacuum (expected failure)")
    }
    def chainMsgs(t: Throwable): String =
      if (t == null) ""
      else Option(t.getMessage).getOrElse("") + "|" + chainMsgs(t.getCause)
    val all = chainMsgs(e).toLowerCase
    assert(all.contains("file") || all.contains("path"),
      s"expected a missing-file failure, got: $all")
  }
}
