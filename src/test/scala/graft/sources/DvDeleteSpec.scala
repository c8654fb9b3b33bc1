package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Merge-on-read DELETE via positional deletion vectors: the
  * file-level contract — a delete rewrites ZERO data files (the whole
  * point vs q_cow_merge's eager path), the sidecar accumulates across
  * versions, live-count arithmetic works from manifest stats alone,
  * and a later CoW rewrite materializes exactly the rewritten files'
  * DV entries. (Value correctness of the DV-applied read is the
  * q_dv_delete oracle gate.) */
class DvDeleteSpec extends SparkSpec {

  private lazy val root = ManifestPrune.ensureLayout(spark, sf0001)
  private lazy val docs = Tables.load(spark, sf0001, "documents")

  private def dataFileState(): Map[String, (Long, Long)] =
    new java.io.File(s"$root/data").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap

  test("a DV delete rewrites zero data files and hides exactly its rows") {
    val before = dataFileState()
    val deletes = docs.filter(col("doc_id") % 11 === 5).select("doc_id")
    val (mf, dv) = ManifestPrune.dvDeleteFrom(spark, root,
      s"$root/manifest", None, deletes, "spec_dv1")
    val after = dataFileState()
    assert(after === before, "a data file changed under a DV delete")
    // manifest carries the SAME file list — nothing moved
    val oldFiles = spark.read.parquet(s"$root/manifest")
      .select("file").collect().map(_.getString(0)).toSet
    val newFiles = spark.read.parquet(mf)
      .select("file").collect().map(_.getString(0)).toSet
    assert(newFiles === oldFiles)
    // the DV-applied read equals the filter semantics, row for row
    val live = ManifestPrune.readVersionWithDv(spark, mf, Some(dv))
    val expect = docs.filter(col("doc_id") % 11 =!= 5)
    assert(live.count() === expect.count())
    assert(live.agg(sum("doc_id")).collect().head.getLong(0) ===
      expect.agg(sum("doc_id")).collect().head.getLong(0))
    // and the base version still reads complete
    assert(ManifestPrune.readVersion(spark, s"$root/manifest").count()
      === docs.count())
  }

  test("deletion vectors accumulate across versions; live count is " +
    "manifest arithmetic") {
    val d1 = docs.filter(col("doc_id") % 13 === 1).select("doc_id")
    val (mf1, dv1) = ManifestPrune.dvDeleteFrom(spark, root,
      s"$root/manifest", None, d1, "spec_dv_a")
    val d2 = docs.filter(col("doc_id") % 13 === 2).select("doc_id")
    val (mf2, dv2) = ManifestPrune.dvDeleteFrom(spark, root,
      mf1, Some(dv1), d2, "spec_dv_b")
    val live = ManifestPrune.readVersionWithDv(spark, mf2, Some(dv2))
    val expect = docs.filter(col("doc_id") % 13 =!= 1 &&
      col("doc_id") % 13 =!= 2)
    assert(live.count() === expect.count())
    // live count from stats alone — no data file touched
    assert(ManifestPrune.liveRowCount(spark, mf2, Some(dv2)) ===
      expect.count())
    // re-deleting an already-hidden key is a no-op (distinct positions)
    val (mf3, dv3) = ManifestPrune.dvDeleteFrom(spark, root,
      mf2, Some(dv2), d1, "spec_dv_c")
    assert(ManifestPrune.readVersionWithDv(spark, mf3, Some(dv3)).count()
      === expect.count())
  }

  test("a CoW merge after a DV delete materializes rewritten files' " +
    "entries and resurrects nothing") {
    val deletes = docs.filter(col("doc_id") % 17 === 4).select("doc_id")
    val (mfD, dvD) = ManifestPrune.dvDeleteFrom(spark, root,
      s"$root/manifest", None, deletes, "spec_dv_cow")
    // narrow update batch → only some files rewritten
    val updates = docs
      .filter(col("doc_id") % 103 === 0 && col("n_chars") < 120)
      .select(col("doc_id"), lit("yy").as("new_lang"))
    val inserts = docs.limit(0)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
    val (_, mfM) = ManifestPrune.cowMergeFrom(spark, root, mfD,
      updates, inserts, "spec_dv_m", baseDv = Some(dvD))
    val carried = ManifestPrune.dvOf(root, -1) // not protocol-named
    val dvM = s"$root/dv_spec_dv_m"
    val dvMOpt = if (new java.io.File(dvM).isDirectory) Some(dvM) else None
    val merged = ManifestPrune.readVersionWithDv(spark, mfM, dvMOpt)
    val expect = docs.filter(col("doc_id") % 17 =!= 4)
    // deleted rows stay gone THROUGH the rewrite, updates applied
    assert(merged.count() === expect.count())
    assert(merged.filter(col("doc_id") % 17 === 4).count() === 0)
    assert(merged.filter(col("doc_id") % 103 === 0 &&
      col("n_chars") < 120 && col("lang") =!= "yy").count() === 0)
    // the carried sidecar references only files that were NOT rewritten
    dvMOpt.foreach { dv =>
      val rewritten = spark.read.parquet(mfM)
        .filter(col("file").contains("data_spec_dv_m"))
        .select("file").collect().map(_.getString(0)).toSet
      val dvFiles = spark.read.parquet(dv)
        .select("file").distinct().collect().map(_.getString(0)).toSet
      assert(dvFiles.intersect(rewritten).isEmpty,
        "a rewritten file kept stale DV entries")
    }
    assert(carried.isEmpty) // dvOf guards non-protocol versions
  }

  test("compactCommit materializes accumulated DVs and restores " +
    "clustering") {
    val proot = graft.Tables.matDir(s"dv_compact_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, proot, nFiles = 6)
    ManifestPrune.dvDeleteCommit(spark, proot,
      docs.filter(col("doc_id") % 5 === 2).select("doc_id"))
    ManifestPrune.dvDeleteCommit(spark, proot,
      docs.filter(col("doc_id") % 9 === 4).select("doc_id"))
    val before = ManifestPrune.readCommitted(spark, proot, 2L)
      .orderBy("doc_id").collect().map(_.toSeq)
    val v3 = ManifestPrune.compactCommit(spark, proot, nFiles = 2)
    assert(v3 === 3L)
    // no sidecar: the deletes are materialized into the data files
    assert(ManifestPrune.dvOf(proot, v3).isEmpty)
    val mf = spark.read.parquet(ManifestPrune.manifestOf(proot, v3))
      .collect()
    assert(mf.length === 2)
    // physical row counts now EQUAL live counts (nothing hidden)
    assert(mf.map(_.getLong(3)).sum === before.length.toLong)
    assert(ManifestPrune.liveRowCount(spark,
      ManifestPrune.manifestOf(proot, v3), None) === before.length.toLong)
    // clustering restored: compacted files' key ranges do not overlap
    val ranges = mf.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges(0)._2 <= ranges(1)._1)
    // reads identical to the pre-compaction DV-applied view
    val after = ManifestPrune.readCommitted(spark, proot, v3)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(after === before)
  }

  test("dvDeleteCommit and cowMergeCommit interleave on one CAS chain") {
    // fresh root so protocol versions start at 0; nanoTime suffix so a
    // leftover dir from a prior JVM run can never seed a stale chain
    val proot = graft.Tables.matDir(s"dv_protocol_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, proot, nFiles = 4)
    val v1 = ManifestPrune.dvDeleteCommit(spark, proot,
      docs.filter(col("doc_id") % 19 === 7).select("doc_id"))
    assert(v1 === 1L)
    assert(ManifestPrune.dvOf(proot, v1).isDefined)
    val v2 = ManifestPrune.cowMergeCommit(spark, proot,
      docs.filter(col("doc_id") % 107 === 0)
        .select(col("doc_id"), lit("ww").as("new_lang")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    assert(v2 === 2L)
    val t = ManifestPrune.readCommitted(spark, proot, v2)
    val expect = docs.filter(col("doc_id") % 19 =!= 7)
    assert(t.count() === expect.count())
    assert(t.filter(col("doc_id") % 19 === 7).count() === 0)
    assert(t.filter(col("doc_id") % 107 === 0 &&
      col("lang") =!= "ww").count() === 0)
  }
}
