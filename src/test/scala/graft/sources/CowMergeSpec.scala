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

  test("deletes drop exactly the matched keys, file-grain") {
    val del = docs.filter(col("doc_id") % 97 === 0).select("doc_id")
    val nDel = del.count()
    assert(nDel > 0)
    val (_, mfDel) = ManifestPrune.cowMergeFrom(spark, root,
      s"$root/manifest", docs.limit(0).select(col("doc_id"),
        col("lang").as("new_lang")), docs.limit(0), "spec_del",
      deletes = Some(del))
    val merged = ManifestPrune.readVersion(spark, mfDel)
    assert(merged.count() === docs.count() - nDel)
    assert(merged.join(del, Seq("doc_id")).count() === 0)
    // untouched files survive at their old paths
    val oldFiles = spark.read.parquet(s"$root/manifest")
      .select("file").collect().map(_.getString(0)).toSet
    val newFiles = spark.read.parquet(mfDel)
      .select("file").collect().map(_.getString(0)).toSet
    assert((newFiles & oldFiles).nonEmpty)
  }

  // own root, unique per JVM run: matDir's session-identity suffix can
  // COLLIDE across JVM restarts (identityHashCode reuse), and _commits
  // markers persist on disk — a stale root would start at version > 0
  private lazy val occRoot =
    graft.Tables.matDir(s"cow_occ_${System.nanoTime}", spark, sf0001)

  test("commit protocol: chained commits each read the previous version") {
    val root2 = occRoot
    docs.repartitionByRange(8, col("n_chars"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$root2/data")
    spark.read.parquet(s"$root2/data")
      .select(col("_metadata.file_path").as("file"), col("n_chars"))
      .groupBy("file")
      .agg(min(col("n_chars")).as("min_key"),
        max(col("n_chars")).as("max_key"),
        count(lit(1)).as("n_rows"))
      .write.mode("overwrite").parquet(s"$root2/manifest")
    assert(ManifestPrune.currentVersion(spark, root2) === 0L)
    val u1 = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), lit("aa").as("new_lang"))
    val none = docs.limit(0)
    val v1 = ManifestPrune.cowMergeCommit(spark, root2, u1, none)
    assert(v1 === 1L && ManifestPrune.currentVersion(spark, root2) === 1L)
    val u2 = docs.filter(col("doc_id") % 11 === 0)
      .select(col("doc_id"), lit("bb").as("new_lang"))
    val v2 = ManifestPrune.cowMergeCommit(spark, root2, u2, none)
    assert(v2 === 2L)
    // v2 sees BOTH commits: bb wins where both touched, aa elsewhere
    val cur = ManifestPrune.readVersion(spark,
      ManifestPrune.manifestOf(root2, 2))
    assert(cur.filter(col("doc_id") % 11 === 0 &&
      col("lang") =!= "bb").count() === 0)
    assert(cur.filter(col("doc_id") % 7 === 0 && col("doc_id") % 11 =!= 0 &&
      col("lang") =!= "aa").count() === 0)
    assert(cur.count() === docs.count())
  }

  test("commit protocol: a racing writer loses the CAS and must retry") {
    // both writers read base N and PREPARE version N+1 concurrently;
    // only one marker create can succeed
    val root2 = occRoot
    val base = ManifestPrune.currentVersion(spark, root2)
    val baseMf = ManifestPrune.manifestOf(root2, base)
    val none = docs.limit(0)
    val uA = docs.filter(col("doc_id") % 13 === 0)
      .select(col("doc_id"), lit("cc").as("new_lang"))
    val uB = docs.filter(col("doc_id") % 17 === 0)
      .select(col("doc_id"), lit("dd").as("new_lang"))
    ManifestPrune.cowMergeFrom(spark, root2, baseMf, uA, none,
      s"c${base + 1}")
    val (_, loserMf) = ManifestPrune.cowMergeFrom(spark, root2, baseMf,
      uB, none, s"race_loser_${base + 1}")
    assert(ManifestPrune.tryCommit(root2, base + 1))        // A wins
    assert(!ManifestPrune.tryCommit(root2, base + 1))       // B loses
    // published state is A's merge; B's prepared dirs are garbage
    assert(ManifestPrune.currentVersion(spark, root2) === base + 1)
    val cur = ManifestPrune.readVersion(spark,
      ManifestPrune.manifestOf(root2, base + 1))
    assert(cur.filter(col("lang") === "dd").count() === 0)
    assert(cur.filter(col("doc_id") % 13 === 0 &&
      col("lang") =!= "cc").count() === 0)
    // B retries against the NEW base and now publishes cleanly
    val v = ManifestPrune.cowMergeCommit(spark, root2, uB, none)
    assert(v === base + 2)
    assert(loserMf.nonEmpty) // (the garbage dirs simply go unreferenced)
  }
}
