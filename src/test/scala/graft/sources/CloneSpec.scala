package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Shallow clones: the sharing contracts — a clone copies ZERO data
  * bytes, evolves independently in both directions, is protected from
  * the source's vacuum while registered, and releases that protection
  * on detach. (Value correctness of the clone-lineage read is the
  * q_clone oracle gate.) */
class CloneSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf0001, "documents")

  private def mkClone(tag: String): (String, String) = {
    val src = Tables.matDir(s"clspec_src_${tag}_${System.nanoTime}",
      spark, sf0001)
    val dst = s"${src}_clone"
    ManifestPrune.buildLayout(docs, src, nFiles = 4)
    ManifestPrune.cloneTable(spark, src, dst)
    (src, dst)
  }

  private def dataParquets(root: String): Seq[String] = {
    val d = new java.io.File(root)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().filter(f => f.isDirectory &&
        f.getName.startsWith("data"))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).toSeq
  }

  test("a clone copies no data, reads the source's state, and the " +
    "two roots evolve independently") {
    val (src, dst) = mkClone("indep")
    assert(dataParquets(dst).isEmpty, "shallow clone copied data files")
    assert(ManifestPrune.readCommitted(spark, dst, 0L).count() ===
      docs.count())
    // clone-side delete is invisible to the source and vice versa
    ManifestPrune.dvDeleteCommit(spark, dst,
      docs.filter(col("doc_id") % 5 === 1).select("doc_id"))
    ManifestPrune.dvDeleteCommit(spark, src,
      docs.filter(col("doc_id") % 7 === 2).select("doc_id"))
    assert(ManifestPrune.readCommitted(spark, dst, 1L).count() ===
      docs.filter(col("doc_id") % 5 =!= 1).count())
    assert(ManifestPrune.readCommitted(spark, src, 1L).count() ===
      docs.filter(col("doc_id") % 7 =!= 2).count())
  }

  test("a clone carries the source head's sidecars (DV and equality)") {
    val src = Tables.matDir(s"clspec_sc_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, src, nFiles = 4)
    ManifestPrune.dvDeleteCommit(spark, src,
      docs.filter(col("doc_id") % 5 === 1).select("doc_id"))
    ManifestPrune.eqDeleteCommit(spark, src,
      docs.filter(col("doc_id") % 7 === 2).select("doc_id"))
    val dst = s"${src}_clone"
    ManifestPrune.cloneTable(spark, src, dst)
    assert(ManifestPrune.readCommitted(spark, dst, 0L).count() ===
      docs.filter(col("doc_id") % 5 =!= 1 &&
        col("doc_id") % 7 =!= 2).count())
  }

  test("the source's vacuum keeps files a registered clone reads; " +
    "detach releases them") {
    val (src, dst) = mkClone("vacuum")
    // source rewrites everything away from the shared files, then
    // expires: the ONLY reference to the original files is the clone
    ManifestPrune.compactCommit(spark, src, nFiles = 2)
    ManifestPrune.expireVersions(spark, src, keepLast = 1, graceMs = 0L)
    assert(ManifestPrune.readCommitted(spark, dst, 0L).count() ===
      docs.count(), "source vacuum destroyed clone-referenced files")
    // after detach the same vacuum reclaims them
    assert(ManifestPrune.detachClone(src, dst))
    val sharedBefore = dataParquets(src)
    ManifestPrune.expireVersions(spark, src, keepLast = 1, graceMs = 0L)
    assert(dataParquets(src).size < sharedBefore.size,
      "detached clone's files were not reclaimed")
  }
}
