package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Snapshot expiry / vacuum over the versioned manifest chain: only
  * files UNREACHABLE from every kept version are destroyed, shared
  * files survive (the swap-by-path sharing is exactly what makes
  * reachability the correct deletion rule), kept versions read
  * byte-identically afterwards, and expired versions' metadata
  * (manifests, DV sidecars, markers) disappears. */
class ExpireVersionsSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  /** Fresh protocol root: 4-file clustered layout + manifest. The
    * nanoTime suffix guarantees a virgin commit chain even if a
    * leftover target/tmp dir from a prior run shares the matDir key
    * (same hermeticity rule as CommitRaceSpec/CowMergeSpec). */
  private def freshRoot(tag: String): String = {
    val root = graft.Tables.matDir(s"expire_${tag}_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    root
  }

  test("expiry destroys only unreachable files; kept versions read " +
    "identically") {
    val root = freshRoot("main")
    // v1: DV delete (no data files written)
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 19 === 7).select("doc_id"))
    // v2: CoW merge rewriting SOME files (narrow update batch)
    ManifestPrune.cowMergeCommit(spark, root,
      docs.filter(col("doc_id") === 0)
        .select(col("doc_id"), lit("vv").as("new_lang")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    val cur = ManifestPrune.currentVersion(spark, root)
    assert(cur === 2L)
    val before = ManifestPrune.readCommitted(spark, root, cur)
      .orderBy("doc_id").collect().map(_.toSeq)
    val v2Files = spark.read
      .parquet(ManifestPrune.manifestOf(root, cur))
      .select("file").collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0))
        .toUri.getPath).toSet
    val rewrittenAway = new java.io.File(s"$root/data").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .filterNot(f => v2Files.contains(f.getAbsolutePath))
    assert(rewrittenAway.nonEmpty,
      "test setup: the merge should have rewritten at least one file")

    val stats = ManifestPrune.expireVersions(spark, root, keepLast = 1, graceMs = 0)
    assert(stats.keptVersions === Seq(2L))
    // exactly the rewritten-away originals were destroyed
    assert(stats.removedDataFiles === rewrittenAway.length.toLong)
    rewrittenAway.foreach(f => assert(!f.exists(), s"orphan survived: $f"))
    // every file v2 references survives — including SHARED ones in
    // the original data/ dir
    v2Files.foreach(p => assert(new java.io.File(p).exists(),
      s"live file destroyed: $p"))
    // expired metadata is gone; the kept version's remains
    assert(!new java.io.File(ManifestPrune.manifestOf(root, 0L)).exists())
    assert(!new java.io.File(ManifestPrune.manifestOf(root, 1L)).exists())
    assert(ManifestPrune.dvOf(root, 1L).isEmpty)
    assert(new java.io.File(ManifestPrune.manifestOf(root, 2L)).isDirectory)
    assert(ManifestPrune.currentVersion(spark, root) === 2L)
    // the kept version reads byte-identically, deletes still hidden
    val after = ManifestPrune.readCommitted(spark, root, cur)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(after === before)
    assert(ManifestPrune.readCommitted(spark, root, cur)
      .filter(col("doc_id") % 19 === 7).count() === 0L)
  }

  test("the default grace window protects an in-flight writer's " +
    "prepared state") {
    val root = freshRoot("grace")
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 37 === 1).select("doc_id"))
    // an in-flight writer: fully prepared seconds ago, publish pending
    val tok = ManifestPrune.prepareToken()
    ManifestPrune.dvDeleteFrom(spark, root,
      ManifestPrune.manifestOf(root, 1L), ManifestPrune.dvOf(root, 1L),
      docs.filter(col("doc_id") % 41 === 2).select("doc_id"), tok)
    // default grace: reachability alone must NOT collect young state —
    // it is indistinguishable from a loser until the window passes
    ManifestPrune.expireVersions(spark, root, keepLast = 1)
    assert(new java.io.File(s"$root/manifest_$tok").isDirectory,
      "in-flight prepared manifest was collected inside the grace window")
    assert(new java.io.File(s"$root/dv_$tok").isDirectory,
      "in-flight prepared sidecar was collected inside the grace window")
    // the writer can still publish after the sweep
    val v = ManifestPrune.publish(root, 1L, s"$root/manifest_$tok")
    assert(v === 2L)
    assert(ManifestPrune.readCommitted(spark, root, v)
      .filter(col("doc_id") % 41 === 2).count() === 0L)
  }

  test("expiry adopts a rename-then-crash winner instead of vacuuming " +
    "its files") {
    val root = freshRoot("adoptvac")
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 43 === 1).select("doc_id"))
    // crashed writer: published manifest_c2, died before its marker
    val tok = ManifestPrune.prepareToken()
    val (mf, dv) = ManifestPrune.dvDeleteFrom(spark, root,
      ManifestPrune.manifestOf(root, 1L), ManifestPrune.dvOf(root, 1L),
      docs.filter(col("doc_id") % 47 === 2).select("doc_id"), tok)
    assert(new java.io.File(mf)
      .renameTo(new java.io.File(ManifestPrune.manifestOf(root, 2L))))
    assert(ManifestPrune.currentVersion(spark, root) === 1L)
    // expiry must treat the published-but-unmarked v2 as the chain
    // head (adopt it), NOT vacuum its sidecar as loser garbage and
    // let a later publish() adopt a corrupted version
    ManifestPrune.expireVersions(spark, root, keepLast = 1, graceMs = 0)
    assert(ManifestPrune.currentVersion(spark, root) === 2L)
    assert(new java.io.File(dv).isDirectory,
      "the adopted version's sidecar was vacuumed")
    val t = ManifestPrune.readCommitted(spark, root, 2L)
    assert(t.filter(col("doc_id") % 43 === 1).count() === 0L)
    assert(t.filter(col("doc_id") % 47 === 2).count() === 0L)
  }

  test("ad-hoc manifests' files survive expiry") {
    val root = freshRoot("adhoc")
    // an ad-hoc CoW merge (non-protocol version name) shares the
    // base data files and adds its own rewrite dir
    val (_, mfV2) = ManifestPrune.cowMergeFrom(spark, root,
      s"$root/manifest",
      docs.filter(col("doc_id") === 1)
        .select(col("doc_id"), lit("qq").as("new_lang")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")), "adhoc_v2")
    val before = ManifestPrune.readVersion(spark, mfV2)
      .orderBy("doc_id").collect().map(_.toSeq)
    // a protocol delete + expiry with keepLast=1 (expires version 0)
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 53 === 3).select("doc_id"))
    ManifestPrune.expireVersions(spark, root, keepLast = 1, graceMs = 0)
    // the ad-hoc version still reads identically — its manifest is a
    // live reference even though no commit marker points at it
    val after = ManifestPrune.readVersion(spark, mfV2)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(after === before)
  }

  test("expiry collects files under hive-style partition subdirs " +
    "(__bp=/__gp= layouts): an expired grouped rewrite's files must " +
    "not orphan one directory level down") {
    val root = freshRoot("subdir")
    // v1: grouped rewrite — data lands under data_<tok>/__gp=<md5>/
    val v1 = ManifestPrune.rewriteGroupedCommit(spark, root, "lang",
      nFiles = 4)
    // v2: a second rewrite — v1's partitioned files become
    // unreachable once keepLast=1 drops v1
    val v2 = ManifestPrune.rewriteGroupedCommit(spark, root, "lang",
      nFiles = 4)
    assert(v2 > v1)
    def parquetUnder(dir: java.io.File): Seq[java.io.File] =
      if (!dir.isDirectory) Seq.empty
      else dir.listFiles().toSeq.flatMap { f =>
        if (f.isDirectory) parquetUnder(f)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
      }
    val keepSet = ManifestPrune.collectFileList(spark,
      spark.read.parquet(ManifestPrune.manifestOf(root, v2))
        .select("file"), "expiry spec keep set")
      .map(u => new org.apache.hadoop.fs.Path(u).toUri.getPath).toSet
    val before = parquetUnder(new java.io.File(root))
      .filterNot(f => f.getPath.contains("/manifest"))
    assert(before.exists(_.getPath.contains("__gp=")),
      "the rewrite must have produced partition subdirs")
    ManifestPrune.expireVersions(spark, root, keepLast = 1,
      graceMs = 0)
    val after = parquetUnder(new java.io.File(root))
      .filterNot(f => f.getPath.contains("/manifest"))
      .map(_.getPath).toSet
    val orphans = after.filterNot(p => keepSet.contains(p))
    assert(orphans.isEmpty,
      s"expired partitioned files must be collected, orphans:\n" +
        orphans.mkString("\n"))
    // the kept head still reads exactly
    assert(ManifestPrune.readCommitted(spark, root, v2).count() ===
      docs.count())
  }

  test("expiry never tree-deletes a LIVE bucketed data dir: the " +
    "head's __bp= partitioned files survive vacuum and the head " +
    "reads identically (the one-level loser check regression)") {
    val root = graft.Tables.matDir(s"expire_bkt_${System.nanoTime}",
      spark, sf0001)
    SpjBucket.buildBucketedLayout(docs, root, "doc_id", 4)
    // two compactions: each writes data_<tok>/__bp=K/ and supersedes
    // the previous; keepLast=1 must collect v1's files but NEVER the
    // head's
    val v1 = ManifestPrune.compactCommit(spark, root, nFiles = 4)
    val v2 = ManifestPrune.compactCommit(spark, root, nFiles = 4)
    assert(v2 > v1)
    ManifestPrune.expireVersions(spark, root, keepLast = 1,
      graceMs = 0)
    assert(ManifestPrune.readCommitted(spark, root, v2).count() ===
      docs.count(),
      "the live bucketed head must survive vacuum")
  }

  test("keepLast spanning every version removes nothing") {
    val root = freshRoot("noop")
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 31 === 1).select("doc_id"))
    val files = new java.io.File(s"$root/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val stats = ManifestPrune.expireVersions(spark, root, keepLast = 5, graceMs = 0)
    assert(stats.removedDataFiles === 0L)
    assert(stats.removedManifestDirs === 0L)
    assert(new java.io.File(s"$root/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      === files)
    assert(new java.io.File(ManifestPrune.manifestOf(root, 0L)).isDirectory)
  }
}
