package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The DataFrameWriterV2 face (`df.writeTo("graft.db.t")`) — the
  * typed API a Spark-native user reaches for before SQL: append()
  * rides AppendData onto the chain's commit, overwrite(lit(true))
  * rides OverwriteByExpression onto the truncate-and-load path, and
  * create() bootstraps a chain through the catalog's createTable.
  * All three land on the same CAS version chain as SQL and the Scala
  * API. */
class GraftWriteToSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf0001, "documents")

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)

  test("writeTo(...).append() commits a version; overwrite(true) " +
    "replaces the contents; create() bootstraps a chain") {
    ensureCatalog()
    val root = Tables.matDir(s"writeto_${System.nanoTime}", spark,
      sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    val tbl = s"wt.t_${System.nanoTime}"
    GraftCatalog.registerTable(tbl, root)

    val extra = docs.orderBy("doc_id").limit(3)
      .select((col("doc_id") + 96000000L).as("doc_id"), col("text"),
        lit("wt").as("lang"), col("source"), col("n_chars"))
    extra.writeTo(s"graft.$tbl").append()
    assert(ManifestPrune.currentVersion(spark, root) === 1L)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.$tbl " +
      "WHERE lang = 'wt'").collect().head.getLong(0) === 3L)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.$tbl")
      .collect().head.getLong(0) === docs.count() + 3)

    // truncate-and-load through the V2 overwrite face
    extra.writeTo(s"graft.$tbl").overwrite(lit(true))
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.$tbl")
      .collect().head.getLong(0) === 3L)
    // the pre-overwrite contents are still time travel away
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.$tbl " +
      "VERSION AS OF 1").collect().head.getLong(0) === docs.count() + 3)

    // create(): a chain born from the typed API (needs a location —
    // route through the warehouse-less path via tblproperties)
    val root2 = Tables.matDir(s"writeto_c_${System.nanoTime}", spark,
      sf0001)
    val tbl2 = s"wt.c_${System.nanoTime}"
    docs.select("doc_id", "lang", "n_chars").limit(10)
      .writeTo(s"graft.$tbl2")
      .using("graft")
      .tableProperty("location", root2)
      .tableProperty("key", "doc_id")
      .create()
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.$tbl2")
      .collect().head.getLong(0) === 10L)
  }
}
