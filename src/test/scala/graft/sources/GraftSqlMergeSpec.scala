package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** SQL MERGE INTO and UPDATE through the catalog's delta-based
  * row-level operation: one committed merge-on-read version per
  * command (positions into the DV sidecar, post-images as a delta
  * file — no data file rewritten), result-equal to the Scala API's
  * mergeIntoCommit on the same inputs. */
class GraftSqlMergeSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  private def ensure(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)

  private def fresh(tag: String): (String, String) = {
    ensure()
    val root = Tables.matDir(s"sqlmerge_${tag}_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    val tbl = s"m.$tag"
    GraftCatalog.registerTable(tbl, root)
    (root, tbl)
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect().map(_.toSeq)

  test("MERGE INTO (update + insert + delete clauses) commits one " +
    "merge-on-read version equal to the API merge, no file rewritten") {
    val (root, tbl) = fresh("full")
    docs.filter(col("doc_id") % 9 === 1)
      .select(col("doc_id"), lit("mg").as("lang"))
      .unionByName(docs.limit(2)
        .select((col("doc_id") + 40000000L).as("doc_id"),
          lit("mg").as("lang")))
      .createOrReplaceTempView("merge_src")
    def dataFiles(): Set[String] =
      new java.io.File(root).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("data"))
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).toSet
    val before = dataFiles()
    spark.sql(s"""MERGE INTO graft.$tbl AS t
      |USING merge_src AS s
      |ON t.doc_id = s.doc_id
      |WHEN MATCHED AND t.doc_id % 27 = 10 THEN DELETE
      |WHEN MATCHED THEN UPDATE SET t.lang = s.lang
      |WHEN NOT MATCHED THEN INSERT
      |  (doc_id, text, lang, source, n_chars)
      |  VALUES (s.doc_id, 'merged row', s.lang, 'sql', 10)
      |""".stripMargin)
    assert(ManifestPrune.currentVersion(spark, root) === 1L)
    // merge-on-read: the base data files are untouched; only the
    // delta file is new
    assert(before.subsetOf(dataFiles()),
      "MERGE must not rewrite or remove existing data files")
    // replay the same semantics through the Scala API on a twin chain
    val twin = Tables.matDir(s"sqlmerge_twin_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, twin, nFiles = 4)
    ManifestPrune.morMergeCommit(spark, twin,
      docs.filter(col("doc_id") % 9 === 1 && col("doc_id") % 27 =!= 10)
        .select(col("doc_id"), lit("mg").as("lang")),
      docs.limit(2).select((col("doc_id") + 40000000L).as("doc_id"),
        lit("merged row").as("text"), lit("mg").as("lang"),
        lit("sql").as("source"), lit(10L).as("n_chars")),
      deletes = Some(docs.filter(col("doc_id") % 9 === 1 &&
        col("doc_id") % 27 === 10).select("doc_id")))
    assert(canon(spark.sql(s"SELECT * FROM graft.$tbl")) ===
      canon(ManifestPrune.readCommitted(spark, twin, 1L)))
  }

  test("UPDATE ... WHERE commits through the same row-level path") {
    val (root, tbl) = fresh("upd")
    spark.sql(s"UPDATE graft.$tbl SET lang = 'up' " +
      "WHERE doc_id % 13 = 4")
    assert(ManifestPrune.currentVersion(spark, root) === 1L)
    val head = spark.sql(s"SELECT * FROM graft.$tbl")
    assert(head.filter(col("doc_id") % 13 === 4 &&
      col("lang") =!= "up").count() === 0L)
    assert(head.filter(col("lang") === "up").count() ===
      docs.filter(col("doc_id") % 13 === 4).count())
    assert(head.count() === docs.count())
  }

  test("a row-level commit whose base advanced underneath fails with " +
    "the retryable conflict instead of masking wrong rows") {
    val (root, _) = fresh("race")
    // the command's scan pinned snapshot 0; a concurrent writer lands
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 31 === 7).select("doc_id"))
    // the delta commit planned against v0 must refuse: its positions
    // reference v0's files/ordinals, not necessarily v1's live rows
    import spark.implicits._
    val stale = intercept[java.util.ConcurrentModificationException] {
      ManifestPrune.deltaCommit(spark, root, expectedBase = 0L,
        positions = Some(Seq(("file", 0L)).toDF("file", "pos")),
        newRows = None, note = "rlo:test")
    }
    assert(stale.getMessage.contains("advanced"))
  }

  test("DELETE with predicates the filter path cannot push (subquery, " +
    "function-of-column) falls back to the row-level delta path") {
    val (root, tbl) = fresh("subq")
    docs.filter(col("doc_id") % 13 === 2).select("doc_id")
      .createOrReplaceTempView("doomed_keys")
    spark.sql(s"DELETE FROM graft.$tbl WHERE doc_id IN " +
      "(SELECT doc_id FROM doomed_keys)")
    assert(spark.sql(s"SELECT count(*) FROM graft.$tbl")
      .head().getLong(0) ===
      docs.filter(col("doc_id") % 13 =!= 2).count())
    // each command is one merge-on-read commit on the chain
    assert(ManifestPrune.currentVersion(spark, root) === 1L)
    spark.sql(s"DELETE FROM graft.$tbl WHERE length(text) < 20")
    assert(ManifestPrune.currentVersion(spark, root) === 2L)
    assert(canon(spark.sql(s"SELECT * FROM graft.$tbl")) ===
      canon(ManifestPrune.readCommitted(spark, root, 2L)))
    assert(spark.sql(s"SELECT count(*) FROM graft.$tbl " +
      "WHERE length(text) < 20").head().getLong(0) === 0L)
  }
}
