package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The SQL catalog face: `spark.sql` over registered chain roots must
  * read exactly what readCommitted computes (DV + equality deletes
  * masked executor-side), travel by version / tag / timestamp, insert
  * and overwrite onto the CAS chain, and DELETE WHERE as a
  * merge-on-read commit. q_sql_catalog hash-gates the values; this
  * pins the resolution and write contracts. */
class GraftCatalogSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)

  /** chain with one commit of each masking kind: CoW merge (v1), DV
    * delete (v2), equality delete (v3). */
  private def chain(tag: String): String = {
    val root = Tables.matDir(s"cat_${tag}_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    ManifestPrune.mergeIntoCommit(spark, root,
      docs.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"), lit("zz").as("lang")),
      docs.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 30000000L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    ManifestPrune.eqDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 17 === 4).select("doc_id"))
    root
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect().map(_.toSeq)

  test("SELECT through the catalog equals readCommitted — DV and " +
    "equality deletes masked in the DSv2 reader, at head and via " +
    "VERSION AS OF / tags / TIMESTAMP AS OF") {
    ensureCatalog()
    val root = chain("read")
    GraftCatalog.registerTable("db.docs_read", root)
    ManifestPrune.tagVersion(root, "pre-erasure", 2L)
    val got = spark.sql("SELECT * FROM graft.db.docs_read")
    assert(got.schema.fieldNames.toSeq ===
      ManifestPrune.readCommitted(spark, root, 3L)
        .schema.fieldNames.toSeq)
    assert(canon(got) ===
      canon(ManifestPrune.readCommitted(spark, root, 3L)))
    (0L to 3L).foreach { v =>
      assert(canon(spark.sql(
        s"SELECT * FROM graft.db.docs_read VERSION AS OF $v")) ===
        canon(ManifestPrune.readCommitted(spark, root, v)),
        s"VERSION AS OF $v diverged")
    }
    assert(canon(spark.sql(
      "SELECT * FROM graft.db.docs_read VERSION AS OF 'pre-erasure'")) ===
      canon(ManifestPrune.readCommitted(spark, root, 2L)))
    // TIMESTAMP AS OF through the in-marker timeline
    val t2 = ManifestPrune.commitTimeMs(root, 2L).get
    val tsLit = new java.sql.Timestamp(t2).toString
    assert(canon(spark.sql("SELECT * FROM graft.db.docs_read " +
      s"TIMESTAMP AS OF '$tsLit'")) ===
      canon(ManifestPrune.readCommitted(spark, root, 2L)))
  }

  test("column pruning reaches the DSv2 reader: a two-column " +
    "projection decodes two fields, and aggregates match the API read") {
    ensureCatalog()
    val root = chain("prune")
    GraftCatalog.registerTable("db.docs_prune", root)
    val sqlAgg = spark.sql("SELECT lang, count(*) AS n, " +
      "sum(n_chars) AS chars FROM graft.db.docs_prune " +
      "GROUP BY lang ORDER BY lang")
    // the scan's readSchema is the pruned column set
    val scanDesc = sqlAgg.queryExecution.executedPlan.toString()
    assert(scanDesc.contains("graft-chain"),
      "the plan must scan through the catalog table")
    assert(scanDesc.contains("cols=[lang,n_chars]") ||
      scanDesc.contains("cols=[n_chars,lang]"),
      s"projection not pruned into the reader:\n$scanDesc")
    val apiAgg = ManifestPrune.readCommitted(spark, root, 3L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
      .orderBy("lang")
    assert(sqlAgg.collect().map(_.toSeq).toSeq ===
      apiAgg.collect().map(_.toSeq).toSeq)
  }

  test("INSERT INTO appends a committed version; INSERT OVERWRITE " +
    "replaces; both visible to the next SQL read") {
    ensureCatalog()
    val root = chain("ins")
    GraftCatalog.registerTable("db.docs_ins", root)
    val before = spark.sql("SELECT count(*) FROM graft.db.docs_ins")
      .head().getLong(0)
    spark.sql("INSERT INTO graft.db.docs_ins VALUES " +
      "(91000001, 'sql row one', 'sq', 's0', 11), " +
      "(91000002, 'sql row two', 'sq', 's0', 11)")
    assert(ManifestPrune.currentVersion(spark, root) === 4L)
    assert(spark.sql("SELECT count(*) FROM graft.db.docs_ins")
      .head().getLong(0) === before + 2)
    assert(spark.sql("SELECT text FROM graft.db.docs_ins WHERE " +
      "doc_id = 91000001").head().getString(0) === "sql row one")
    // OVERWRITE: the head becomes exactly the new rows
    spark.sql("INSERT OVERWRITE graft.db.docs_ins " +
      "SELECT * FROM graft.db.docs_ins WHERE lang = 'sq'")
    assert(spark.sql("SELECT count(*) FROM graft.db.docs_ins")
      .head().getLong(0) === 2L)
    assert(ManifestPrune.commitNote(root,
      ManifestPrune.currentVersion(spark, root)) === Some("replace"))
    // the pre-overwrite state is still travel-able
    assert(spark.sql("SELECT count(*) FROM graft.db.docs_ins " +
      "VERSION AS OF 4").head().getLong(0) === before + 2)
  }

  test("graft.db.t.history is a queryable metadata table, and SHOW " +
    "TABLES lists registered names") {
    ensureCatalog()
    val root = chain("hist")
    GraftCatalog.registerTable("db.docs_hist", root)
    val hist = spark.sql("SELECT version, kind, live_rows FROM " +
      "graft.db.docs_hist.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(hist.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(hist.map(_._2).toSeq ===
      Seq("base", "rewrite", "dv-delete", "eq-delete"))
    // aggregates over the metadata relation work like any table
    assert(spark.sql("SELECT count(*) FROM graft.db.docs_hist.history " +
      "WHERE kind = 'dv-delete'").head().getLong(0) === 1L)
    val names = spark.sql("SHOW TABLES IN graft.db")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(names.contains("docs_hist"))
  }

  test("DELETE FROM ... WHERE commits a merge-on-read version: rows " +
    "hidden, no data file touched, predicate algebra translated") {
    ensureCatalog()
    val root = chain("del")
    GraftCatalog.registerTable("db.docs_del", root)
    def dataFiles(): Set[String] =
      new java.io.File(root).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("data"))
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).toSet
    val before = dataFiles()
    val want = spark.sql("SELECT count(*) FROM graft.db.docs_del " +
      "WHERE NOT (doc_id % 5 = 2 AND lang <> 'zz')").head().getLong(0)
    spark.sql("DELETE FROM graft.db.docs_del " +
      "WHERE doc_id % 5 = 2 AND lang <> 'zz'")
    assert(dataFiles() === before, "a MoR delete must touch no data file")
    assert(spark.sql("SELECT count(*) FROM graft.db.docs_del")
      .head().getLong(0) === want)
    assert(spark.sql("SELECT count(*) FROM graft.db.docs_del " +
      "WHERE doc_id % 5 = 2 AND lang <> 'zz'").head().getLong(0) === 0L)
    // and SQL + API agree on the post-delete state
    assert(canon(spark.sql("SELECT * FROM graft.db.docs_del")) ===
      canon(ManifestPrune.readCommitted(spark, root,
        ManifestPrune.currentVersion(spark, root))))
  }
}
