package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE: the file-grain contract — only files holding a
  * matched key are rewritten, the committed manifest stitches old and
  * new paths, and the pre-merge version stays fully readable. (Value
  * correctness of the merged table is the q_cow_merge oracle gate.) */
class CowMergeSpec extends SparkSpec {

  private lazy val root = ManifestPrune.ensureLayout(spark, sf0001)
  private lazy val docs = Tables.load(spark, sf0001, "documents")

  // a batch that touches a NARROW key range, so most clustered files
  // have no matched key and must survive at their old paths
  private lazy val updates = docs
    .filter(col("doc_id") % 101 === 0 && col("n_chars") < 120)
    .select(col("doc_id"), lit("zz").as("new_lang"))
  private lazy val inserts = docs.filter(col("doc_id") < 3)
    .select((col("doc_id") + 5000000L).as("doc_id"), col("text"),
      lit("new").as("lang"), col("source"), col("n_chars"))

  private lazy val (dataV2, mfV2) =
    ManifestPrune.cowMerge(spark, root, updates, inserts, "spec_v2")

  test("only files containing a matched key are rewritten") {
    val oldFiles = spark.read.parquet(s"$root/manifest")
      .select("file").collect().map(_.getString(0)).toSet
    val newManifest = spark.read.parquet(mfV2)
      .select("file").collect().map(_.getString(0)).toSet
    val kept = newManifest & oldFiles
    val rewritten = newManifest -- oldFiles
    assert(kept.nonEmpty, "no untouched file survived at its old path")
    assert(rewritten.nonEmpty, "no rewritten file in the new manifest")
    assert(rewritten.forall(_.contains("data_spec_v2")))
    // the rewrite really was file-grain: fewer new files than old
    assert(rewritten.size < oldFiles.size,
      s"rewrote ${rewritten.size} of ${oldFiles.size} files — not pruned")
  }

  test("merged version has updates applied and inserts appended") {
    val merged = ManifestPrune.readVersion(spark, mfV2)
    assert(merged.count() === docs.count() + 3)
    val updatedKeys = updates.select("doc_id").collect().map(_.getLong(0))
    assert(updatedKeys.nonEmpty)
    assert(merged.filter(col("doc_id").isin(updatedKeys.toIndexedSeq: _*) &&
      col("lang") =!= "zz").count() === 0)
    assert(merged.filter(col("lang") === "new").count() === 3)
    // no duplicate keys leaked from the rewrite
    assert(merged.select("doc_id").distinct().count() === merged.count())
  }

  test("the pre-merge version stays readable and unmodified") {
    val old = ManifestPrune.readVersion(spark, s"$root/manifest")
    assert(old.count() === docs.count())
    assert(old.filter(col("lang") === "zz").count() === 0)
    assert(old.filter(col("lang") === "new").count() === 0)
  }
}
