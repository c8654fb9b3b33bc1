package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** `graft.db.t.files` — the per-file metadata relation
  * ([[GraftFilesTable]]). q_sql_files hash-gates the aggregate
  * arithmetic; this pins the per-file contracts the hash can't see:
  * one row per live manifest entry, DV hits attributed to the RIGHT
  * file, stats round-tripping the manifest values, and the plan being
  * a distributed scan (V1 relation), never a driver-local rows()
  * materialization of the file list. */
class GraftFilesTableSpec extends SparkSpec {

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)

  test("one row per manifest file; DV hits land on the file that " +
    "holds the deleted rows; stats equal the manifest's") {
    ensureCatalog()
    val docs = Tables.load(spark, sf0001, "documents")
    val root = Tables.matDir(s"files_${System.nanoTime}", spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    val tbl = s"ft.t${System.nanoTime}"
    GraftCatalog.registerTable(tbl, root)

    val files = spark.sql(s"SELECT * FROM graft.$tbl.files")
    val cur = ManifestPrune.currentVersion(spark, root)
    val manifest = spark.read.parquet(ManifestPrune.manifestOf(root, cur))

    assert(files.count() == manifest.count())
    // the per-column stats render as one JSON doc per file
    // (Iceberg's readable_metrics idea): parseable, and the doc_id
    // bounds inside agree with the data
    val sj = files.select("stats_json").collect().map(_.getString(0))
    assert(sj.forall(_ != null))
    val lows = sj.map { j =>
      val m = spark.range(1).select(
        get_json_object(lit(j), "$.cstats_long.doc_id.lo"))
        .collect().head.getString(0)
      m.toLong
    }
    assert(lows.min === docs.agg(min("doc_id")).head.getLong(0))
    // total physical rows and hidden rows reconcile with the corpus
    val agg = files.agg(sum("n_rows"), sum("hidden_rows"))
      .collect().head
    assert(agg.getLong(0) == docs.count())
    assert(agg.getLong(1) ==
      docs.filter(col("doc_id") % 7 === 3).count())
    // per-file attribution: join the DV sidecar's own grouping — the
    // relation must agree file-by-file, not just in total
    val dvDir = ManifestPrune.dvOf(root, cur).get
    val expected = spark.read.parquet(dvDir).groupBy("file").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    files.select("file", "hidden_rows").collect().foreach { r =>
      assert(r.getLong(1) == expected.getOrElse(r.getString(0), 0L),
        s"hidden_rows misattributed for ${r.getString(0)}")
    }
    // stats round-trip: min/max strings parse back to the manifest's
    val mm = manifest.agg(min(col("min_key").cast("long")),
      max(col("max_key").cast("long"))).collect().head
    val fm = files.agg(min(col("min_key").cast("long")),
      max(col("max_key").cast("long"))).collect().head
    assert(fm.getLong(0) == mm.getLong(0) && fm.getLong(1) == mm.getLong(1))
  }

  test("VERSION AS OF applies to the metadata table: v0's files " +
    "show no hidden rows, head shows the DV delete") {
    ensureCatalog()
    val docs = Tables.load(spark, sf0001, "documents")
    val root = Tables.matDir(s"filestt_${System.nanoTime}", spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    val tbl = s"ftt.t${System.nanoTime}"
    GraftCatalog.registerTable(tbl, root)
    val atV0 = spark.sql(
      s"SELECT sum(hidden_rows) FROM graft.$tbl.files VERSION AS OF 0")
      .collect().head.getLong(0)
    val atHead = spark.sql(
      s"SELECT sum(hidden_rows) FROM graft.$tbl.files")
      .collect().head.getLong(0)
    assert(atV0 == 0L)
    assert(atHead == docs.filter(col("doc_id") % 7 === 3).count())
  }

  test("the scan is a distributed relation, not a driver-local " +
    "row materialization") {
    ensureCatalog()
    val docs = Tables.load(spark, sf0001, "documents")
    val root = Tables.matDir(s"filesplan_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    val tbl = s"ftp.t${System.nanoTime}"
    GraftCatalog.registerTable(tbl, root)
    val plan = spark.sql(s"SELECT * FROM graft.$tbl.files")
      .queryExecution.executedPlan.toString
    // LocalScan would show as LocalTableScan; the V1 bridge plans a
    // real RDD scan
    assert(!plan.contains("LocalTableScan"),
      s".files must not materialize on the driver:\n$plan")
  }
}
