package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Writable branches on the version chain (Iceberg branch refs): a
  * branch is a full sub-root sharing the parent's data files by
  * absolute path, so every chain face works on it unchanged. Pins:
  * fork fidelity (including a DV-bearing fork), write isolation both
  * directions, fast-forward squash publish with sidecar rehoming,
  * divergence rejection, and the guarded drop. */
class BranchSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")
  private val MP = ManifestPrune

  private def freshRoot(tag: String): String = {
    val root = graft.Tables.matDir(s"branch_${tag}_${System.nanoTime}",
      spark, sf0001)
    MP.buildLayout(docs, root, nFiles = 4)
    root
  }

  test("branch head equals the fork state — including a fork version " +
    "whose deletion vectors hide rows") {
    val root = freshRoot("fork")
    MP.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 13 === 2).select("doc_id"))
    MP.createBranch(spark, root, "b1", fromVersion = 1L)
    val br = MP.branchRoot(root, "b1")
    assert(MP.currentVersion(spark, br) === 0L)
    val main = MP.readCommitted(spark, root, 1L)
      .orderBy("doc_id").collect().map(_.toSeq)
    val branch = MP.readBranch(spark, root, "b1")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(branch === main)
    // the fork's hidden rows stay hidden on the branch
    assert(MP.readBranch(spark, root, "b1")
      .filter(col("doc_id") % 13 === 2).count() === 0L)
  }

  test("branch writes are invisible on main and main writes are " +
    "invisible on the branch") {
    val root = freshRoot("iso")
    MP.createBranch(spark, root, "iso", fromVersion = 0L)
    val br = MP.branchRoot(root, "iso")
    val mainBefore = MP.readCommitted(spark, root, 0L)
      .orderBy("doc_id").collect().map(_.toSeq)
    MP.mergeIntoCommit(spark, br,
      docs.filter(col("doc_id") % 5 === 1)
        .select(col("doc_id"), lit("iso").as("lang")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    // main unchanged, byte-for-byte
    assert(MP.currentVersion(spark, root) === 0L)
    val mainAfter = MP.readCommitted(spark, root, 0L)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(mainAfter === mainBefore)
    // a main commit does NOT appear on the branch
    MP.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") === 7).select("doc_id"))
    assert(MP.readBranch(spark, root, "iso")
      .filter(col("doc_id") === 7).count() === 1L)
  }

  test("fastForward squash-publishes the branch head onto main, " +
    "rehoming the DV sidecar") {
    val root = freshRoot("ff")
    MP.createBranch(spark, root, "wap", fromVersion = 0L)
    val br = MP.branchRoot(root, "wap")
    MP.mergeIntoCommit(spark, br,
      docs.filter(col("doc_id") % 7 === 3)
        .select(col("doc_id"), lit("ff").as("lang")),
      docs.filter(col("doc_id") % 29 === 1)
        .select((col("doc_id") + 50000L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    MP.dvDeleteCommit(spark, br,
      docs.filter(col("doc_id") % 10 === 4).select("doc_id"))
    val head = MP.readBranch(spark, root, "wap")
      .orderBy("doc_id").collect().map(_.toSeq)
    val v = MP.fastForward(spark, root, "wap")
    assert(v === 1L)
    // squash: main gained exactly one version, equal to the head
    assert(MP.currentVersion(spark, root) === 1L)
    val main = MP.readCommitted(spark, root, 1L)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(main === head)
    // the DV rode along: merge-on-read deletes stay hidden on main
    assert(MP.readCommitted(spark, root, 1L)
      .filter(col("doc_id") % 10 === 4 && col("doc_id") < 50000L)
      .count() === 0L)
    // and the rehomed sidecar lives under MAIN's root
    val dv = MP.dvOf(root, 1L)
    assert(dv.isDefined)
    assert(new java.io.File(dv.get).getParentFile.getAbsolutePath ===
      new java.io.File(root).getAbsolutePath)
  }

  test("fastForward rejects a diverged main with a clear error and " +
    "an empty branch with a clear error") {
    val root = freshRoot("div")
    MP.createBranch(spark, root, "stale", fromVersion = 0L)
    val br = MP.branchRoot(root, "stale")
    val e0 = intercept[IllegalArgumentException] {
      MP.fastForward(spark, root, "stale")
    }
    assert(e0.getMessage.contains("no commits"))
    MP.dvDeleteCommit(spark, br,
      docs.filter(col("doc_id") === 3).select("doc_id"))
    // main advances past the fork
    MP.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") === 5).select("doc_id"))
    val e = intercept[IllegalStateException] {
      MP.fastForward(spark, root, "stale")
    }
    assert(e.getMessage.contains("diverged"))
    assert(MP.currentVersion(spark, root) === 1L)
  }

  test("dropBranch refuses while main references branch files; " +
    "compaction rehomes main and unblocks the drop") {
    val root = freshRoot("drop")
    MP.createBranch(spark, root, "gone", fromVersion = 0L)
    val br = MP.branchRoot(root, "gone")
    MP.mergeIntoCommit(spark, br,
      docs.filter(col("doc_id") % 3 === 1)
        .select(col("doc_id"), lit("dr").as("lang")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    MP.fastForward(spark, root, "gone")
    val e = intercept[IllegalArgumentException] {
      MP.dropBranch(spark, root, "gone")
    }
    assert(e.getMessage.contains("still references"))
    // rehome main's live rows into main-owned files, expire the
    // version that still pointed into the branch, then drop
    MP.compactCommit(spark, root, nFiles = 4)
    MP.expireVersions(spark, root, keepLast = 1, graceMs = 0)
    val before = MP.readCommitted(spark, root, 2L)
      .orderBy("doc_id").collect().map(_.toSeq)
    MP.dropBranch(spark, root, "gone")
    assert(!new java.io.File(MP.branchRoot(root, "gone")).exists())
    assert(MP.listBranches(root).isEmpty)
    // main reads identically with the branch gone
    val after = MP.readCommitted(spark, root, 2L)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(after === before)
  }

  test("rebaseBranch replays the branch onto a diverged main's head " +
    "and fastForward then publishes both sides' changes") {
    val root = freshRoot("rebase")
    MP.createBranch(spark, root, "feat", fromVersion = 0L)
    val br = MP.branchRoot(root, "feat")
    // branch touches ODD keys only
    MP.mergeIntoCommit(spark, br,
      docs.filter(col("doc_id") % 2 === 1 && col("doc_id") % 5 === 2)
        .select(col("doc_id"), lit("rb").as("lang")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    // main diverges, touching EVEN keys only
    MP.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 2 === 0 && col("doc_id") % 13 === 4)
        .select("doc_id"))
    val head = MP.rebaseBranch(spark, root, "feat")
    assert(head >= 1L)
    assert(MP.forkVersion(root, "feat") === 1L)
    // rebased branch = main's deletes AND the branch's updates
    val b = MP.readBranch(spark, root, "feat")
    assert(b.filter(col("doc_id") % 2 === 0 &&
      col("doc_id") % 13 === 4).count() === 0L)
    assert(b.filter(col("doc_id") % 2 === 1 && col("doc_id") % 5 === 2 &&
      col("lang") =!= "rb").count() === 0L)
    // no leftover temp branch after the swap
    assert(MP.listBranches(root) === Seq("feat"))
    // and the publish now goes through
    val v = MP.fastForward(spark, root, "feat")
    val main = MP.readCommitted(spark, root, v)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(main === b.orderBy("doc_id").collect().map(_.toSeq))
  }

  test("rebaseBranch refuses at key grain when both sides touched " +
    "the same key, naming samples") {
    val root = freshRoot("conflict")
    MP.createBranch(spark, root, "clash", fromVersion = 0L)
    val br = MP.branchRoot(root, "clash")
    MP.mergeIntoCommit(spark, br,
      docs.filter(col("doc_id").isin(7L, 21L))
        .select(col("doc_id"), lit("xx").as("lang")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    MP.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id").isin(21L, 30L)).select("doc_id"))
    val e = intercept[IllegalStateException] {
      MP.rebaseBranch(spark, root, "clash")
    }
    assert(e.getMessage.contains("conflicts"))
    assert(e.getMessage.contains("21"))
    // nothing was swapped or dropped
    assert(MP.listBranches(root) === Seq("clash"))
    assert(MP.readBranch(spark, root, "clash")
      .filter(col("lang") === "xx").count() === 2L)
  }

  test("branch commits enforce the table's CHECK constraints copied " +
    "at creation") {
    val root = freshRoot("check")
    MP.addConstraint(root, "lang-nonempty", "length(lang) > 0")
    MP.createBranch(spark, root, "audited", fromVersion = 0L)
    val br = MP.branchRoot(root, "audited")
    val e = intercept[IllegalStateException] {
      MP.mergeIntoCommit(spark, br,
        docs.filter(col("doc_id") % 17 === 1)
          .select(col("doc_id"), lit("").as("lang")),
        docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars")))
    }
    assert(e.getMessage.contains("lang-nonempty"))
    // the failed commit published nothing on the branch
    assert(MP.currentVersion(spark, br) === 0L)
  }

  test("vacuuming main never breaks a branch: files only a branch " +
    "references survive main's expiry") {
    val root = freshRoot("vac")
    MP.createBranch(spark, root, "keepme", fromVersion = 0L)
    val br = MP.branchRoot(root, "keepme")
    val before = MP.readCommitted(spark, br, 0L)
      .orderBy("doc_id").collect().map(_.toSeq)
    // main rewrites EVERYTHING twice (compactions), so v0's files are
    // referenced by nothing on main once keepLast=1 expires history —
    // the branch fork is their only remaining reader
    MP.compactCommit(spark, root, nFiles = 2)
    MP.compactCommit(spark, root, nFiles = 3)
    MP.expireVersions(spark, root, keepLast = 1, graceMs = 0L)
    val after = MP.readCommitted(spark, br, 0L)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(after === before)
  }

  test("tags and time travel work on a branch root — a branch IS a " +
    "chain, and its tags anchor its own retention") {
    val root = freshRoot("ttl")
    MP.createBranch(spark, root, "feat", fromVersion = 0L)
    val br = MP.branchRoot(root, "feat")
    val v1 = MP.dvDeleteCommit(spark, br,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    val t1 = MP.commitTimeMs(br, v1).get
    MP.tagVersion(br, "audit-point", v1)
    val v2 = MP.dvDeleteCommit(spark, br,
      docs.filter(col("doc_id") % 5 === 1).select("doc_id"))
    // timestamps live inside the markers, strictly monotonic by
    // protocol — as-of t1 must resolve to v1 with no mtime nudging
    val t2 = MP.commitTimeMs(br, v2).get
    assert(t2 > t1, s"branch marker timeline not monotonic: $t1 -> $t2")
    assert(MP.versionAsOf(spark, br, t1) === v1)
    assert(MP.readAsOf(spark, br, t1).count() ===
      MP.readCommitted(spark, br, v1).count())
    assert(MP.taggedVersion(br, "audit-point") === Some(v1))
    // branch-local expiry: the tag anchors v1 while keepLast=1 would
    // otherwise expire it
    MP.dvDeleteCommit(spark, br,
      docs.filter(col("doc_id") % 11 === 6).select("doc_id"))
    MP.expireVersions(spark, br, keepLast = 1, graceMs = 0L)
    assert(MP.readTagged(spark, br, "audit-point")
      .count() === MP.readCommitted(spark, br, v1).count())
  }
}
