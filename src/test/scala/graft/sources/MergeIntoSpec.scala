package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The general MERGE INTO face (mergeIntoCommit): WHEN MATCHED UPDATE
  * SET over ARBITRARY columns (not just lang), NOT MATCHED INSERT,
  * and MATCHED-by-key DELETE, all in one committed CoW version — plus
  * the guardrails (unknown SET column refused, key-only updates
  * refused) and the NULL-keeps-old-value coalesce contract. */
class MergeIntoSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  private def fresh(): String = {
    val root = graft.Tables.matDir(s"mi_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    root
  }

  test("the whole chain face works on a non-default key and a table " +
    "without a lang column (key threaded through merge/delete/feed)") {
    // rename the key and DROP lang entirely — the r11 surface
    // advertised `key` on changeFeed/replicateFeed but the appliers
    // hardcoded doc_id + a new_lang shim; this pins the full plumbing
    val t0 = docs.select(col("doc_id").as("id"), col("text"),
      col("source"), col("n_chars"))
    val root = graft.Tables.matDir(s"mi_key_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(t0, root, nFiles = 4,
      clusterCols = Seq("n_chars", "id"))
    // v1: merge (update + insert) on key=id
    ManifestPrune.mergeIntoCommit(spark, root,
      t0.filter(col("id") % 9 === 2)
        .select(col("id"), lit("merged").as("source")),
      t0.filter(col("id") % 31 === 3)
        .select((col("id") + 30000000L).as("id"), col("text"),
          col("source"), col("n_chars")),
      key = "id")
    // v2: DV delete on key=id
    ManifestPrune.dvDeleteCommit(spark, root,
      t0.filter(col("id") % 7 === 3).select("id"), key = "id")
    val head = ManifestPrune.readCommitted(spark, root, 2L).cache()
    assert(head.filter(col("source") === "merged").count() ===
      t0.filter(col("id") % 9 === 2 && col("id") % 7 =!= 3).count())
    assert(head.filter(col("id") % 7 === 3 &&
      col("id") < 30000000L).count() === 0L)
    // feed + replica on the custom key: converge to the head state
    val dst = graft.Tables.matDir(s"mi_key_dst_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(t0, dst, nFiles = 4,
      clusterCols = Seq("n_chars", "id"))
    ManifestPrune.replicateFeed(spark, root, dst, 0L, 2L, key = "id")
    val rep = ManifestPrune.readCommitted(spark, dst,
      ManifestPrune.currentVersion(spark, dst))
      .orderBy("id").collect().map(_.toSeq)
    assert(rep === head.orderBy("id").collect().map(_.toSeq))
  }

  test("one commit applies multi-column SET, inserts, and deletes") {
    val root = fresh()
    val v = ManifestPrune.mergeIntoCommit(spark, root,
      docs.filter(col("doc_id") % 9 === 2)
        .select(col("doc_id"), lit("mm").as("lang"),
          lit("merged").as("source")),
      docs.filter(col("doc_id") % 31 === 3)
        .select((col("doc_id") + 30000000L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")),
      deletes = Some(docs.filter(col("doc_id") % 17 === 4)
        .select("doc_id")))
    assert(v === 1L)
    val t = ManifestPrune.readCommitted(spark, root, v).cache()
    // updates hit BOTH columns, but not on deleted keys
    val updLive = docs.filter(col("doc_id") % 9 === 2 &&
      col("doc_id") % 17 =!= 4).count()
    assert(t.filter(col("lang") === "mm").count() === updLive)
    assert(t.filter(col("source") === "merged").count() === updLive)
    assert(t.filter(col("lang") === "mm" &&
      col("source") =!= "merged").count() === 0L)
    // deletes and inserts
    assert(t.filter(col("doc_id") % 17 === 4 &&
      col("doc_id") < 30000000L).count() === 0L)
    assert(t.filter(col("doc_id") >= 30000000L).count() ===
      docs.filter(col("doc_id") % 31 === 3).count())
    assert(t.count() === docs.filter(col("doc_id") % 17 =!= 4).count()
      + docs.filter(col("doc_id") % 31 === 3).count())
  }

  test("NULL SET values keep the old value; bad updates are refused") {
    val root = fresh()
    ManifestPrune.mergeIntoCommit(spark, root,
      docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 0, lit("ee"))
            .otherwise(lit(null)).cast("string").as("lang")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    val t = ManifestPrune.readCommitted(spark, root, 1L)
    assert(t.filter(col("lang") === "ee").count() ===
      docs.filter(col("doc_id") % 10 === 0).count())
    // the null-update half kept its original lang
    val kept = t.join(docs.select(col("doc_id"),
        col("lang").as("lang0")), "doc_id")
      .filter(col("doc_id") % 5 === 0 && col("doc_id") % 10 =!= 0)
    assert(kept.filter(col("lang") =!= col("lang0")).count() === 0L)
    // unknown SET column → clear refusal
    val e = intercept[IllegalArgumentException] {
      ManifestPrune.mergeIntoCommit(spark, root,
        docs.limit(1).select(col("doc_id"), lit(1).as("nope")),
        docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars")))
    }
    assert(e.getMessage.contains("nope"))
    // key-only updates → clear refusal
    intercept[IllegalArgumentException] {
      ManifestPrune.mergeIntoCommit(spark, root,
        docs.limit(1).select("doc_id"),
        docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars")))
    }
  }

  test("a SET on the clustering column refreshes the manifest stats") {
    val root = fresh()
    ManifestPrune.mergeIntoCommit(spark, root,
      docs.filter(col("doc_id") % 3 === 1)
        .select(col("doc_id"),
          (col("n_chars") + 100000L).as("n_chars")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    val t = ManifestPrune.readCommitted(spark, root, 1L)
    assert(t.filter(col("n_chars") >= 100000L).count() ===
      docs.filter(col("doc_id") % 3 === 1).count())
    // rewritten files' manifest max_key must cover the new values —
    // otherwise range planning over this version would silently skip
    // them (statsManifest recomputes per rewritten file)
    val mf = spark.read.parquet(ManifestPrune.manifestOf(root, 1L))
    assert(mf.agg(max(col("max_key"))).collect().head.getLong(0)
      >= 100000L)
  }
}
