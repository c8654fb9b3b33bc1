package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The per-file bloom index's pruning and correctness contracts:
  * a point plan keeps strictly fewer files than the manifest (the
  * range stats cannot prune doc_id probes at all), the screened read
  * equals the full-scan filter row for row, absent keys return
  * nothing, and a rebuilt index serves a compacted file set. (The
  * value gate is q_point_lookup.) */
class PointLookupSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf0001, "documents")

  private def chain(): String = {
    val root = Tables.matDir(s"ptspec_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 8)
    root
  }

  test("the bloom plan prunes files the range stats cannot, and the " +
    "screened read equals the full-scan filter") {
    val root = chain()
    BloomIndex.build(spark, root, 0L)
    val keys = Seq(5L, 250L, 444L)
    val planned = BloomIndex.planFiles(spark, root, 0L, keys)
    val all = spark.read.parquet(s"$root/manifest").count()
    assert(planned.nonEmpty && planned.size < all,
      s"bloom plan kept ${planned.size} of $all files — no pruning")
    // range stats genuinely can't help here: every file's n_chars
    // span covers the probe (pruning on doc_id isn't even defined)
    val got = BloomIndex.readPoint(spark, root, 0L, "doc_id", keys)
      .orderBy("doc_id").collect().map(_.toSeq)
    val want = docs.filter(col("doc_id").isin(keys: _*))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got === want)
  }

  test("an absent key returns no rows; a DV-deleted key is hidden " +
    "even when its file passes the bloom screen") {
    val root = chain()
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") === 42).select("doc_id"))
    BloomIndex.build(spark, root, 1L)
    assert(BloomIndex.readPoint(spark, root, 1L, "doc_id",
      Seq(10000001L)).count() === 0L)
    // 42 IS in the sketch (blooms index physical rows) but the read
    // applies the version's sidecars after the screen
    assert(BloomIndex.readPoint(spark, root, 1L, "doc_id",
      Seq(42L, 43L)).select("doc_id").collect().map(_.getLong(0))
      .toSeq === Seq(43L))
  }

  test("incremental extend after an append carries old sketches and " +
    "sketches only the new files; answers match a full rebuild") {
    val root = chain()
    BloomIndex.build(spark, root, 0L)
    ManifestPrune.appendCommit(spark, root,
      docs.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 7000000L))
    BloomIndex.extend(spark, root, 0L, 1L)
    // carried rows are byte-identical to the v0 index's
    val v0 = spark.read.parquet(BloomIndex.indexOf(root, 0L).get)
      .collect().map(r => r.getString(0) ->
        r.getAs[Array[Byte]](1).toSeq).toMap
    val v1 = spark.read.parquet(BloomIndex.indexOf(root, 1L).get)
      .collect().map(r => r.getString(0) ->
        r.getAs[Array[Byte]](1).toSeq).toMap
    assert(v0.keySet.subsetOf(v1.keySet))
    v0.foreach { case (f, b) => assert(v1(f) === b,
      s"carried sketch for $f changed under extend") }
    // lookups resolve across both eras
    assert(BloomIndex.readPoint(spark, root, 1L, "doc_id",
      Seq(7000003L, 5L)).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(5L, 7000003L))
  }

  test("a rebuilt index serves the compacted file set") {
    val root = chain()
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 9 === 1).select("doc_id"))
    ManifestPrune.compactCommit(spark, root, nFiles = 3)
    BloomIndex.build(spark, root, 2L)
    val keys = Seq(1L, 2L, 3L) // 1 is deleted (1 % 9 == 1)
    assert(BloomIndex.readPoint(spark, root, 2L, "doc_id", keys)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(2L, 3L))
    val planned = BloomIndex.planFiles(spark, root, 2L, keys)
    assert(planned.forall(f => new java.io.File(
      new java.net.URI(f).getPath).exists()))
  }

  test("branches resolve the parent's index at the fork and extend " +
    "carries it: point lookups on a branch never fall back to scans") {
    val root = chain()
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    BloomIndex.build(spark, root, 1L)
    val br = ManifestPrune.createBranch(spark, root, "idx", 1L)
    // a fresh branch has no local index, but its v0 file set IS the
    // fork's — the parent's sketches answer verbatim
    assert(BloomIndex.indexOf(br, 0L) === BloomIndex.indexOf(root, 1L))
    val keys = Seq(5L, 250L, 444L)
    val planned = BloomIndex.planFiles(spark, br, 0L, keys)
    val all = spark.read.parquet(s"$br/manifest").count()
    assert(planned.nonEmpty && planned.size < all,
      s"branch plan kept ${planned.size} of $all files — no pruning")
    val got = BloomIndex.readPoint(spark, br, 0L, "doc_id", keys)
      .orderBy("doc_id").collect().map(_.toSeq)
    val want = docs.filter(col("doc_id").isin(keys: _*) &&
        col("doc_id") % 7 =!= 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got === want)
    // a branch commit extends FROM the parent-resolved index: only
    // the branch's new files are sketched, lookups see the new rows
    ManifestPrune.appendCommit(spark, br,
      docs.limit(2).withColumn("doc_id", col("doc_id") + 87000000L))
    BloomIndex.extend(spark, br, 0L, 1L)
    assert(BloomIndex.indexOf(br, 1L).get.startsWith(br),
      "the extended index must live under the branch root")
    val newKey = docs.orderBy("doc_id").limit(1)
      .head().getLong(0) + 87000000L
    val hit = BloomIndex.readPoint(spark, br, 1L, "doc_id",
      Seq(newKey, 5L)).orderBy("doc_id").collect().map(_.toSeq)
    assert(hit.length === 2 && hit.last.head === newKey)
  }
}
