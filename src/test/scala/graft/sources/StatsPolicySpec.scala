package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PER-TABLE COLUMN-STATISTICS POLICY (round 16 — the Iceberg
  * `write.metadata.metrics` economics): statting every column costs
  * every commit its per-column aggregate, so
  * TBLPROPERTIES('stats.columns') trims the set. The contract under
  * test: an excluded column has NO cstats entry in rows committed
  * under the policy — so metadata aggregates on it REFUSE (exact scan
  * fallback), predicates on it don't prune (advisory rule), and
  * included columns keep every planning privilege. Policy changes
  * apply to commits from now on; old rows keep their entries. */
class StatsPolicySpec extends SparkSpec {

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)

  private def docs: DataFrame =
    Tables.load(spark, sf0001, "documents")

  test("parse: all/none/include/exclude round-trip; junk fails fast") {
    assert(ManifestPrune.parseStatsPolicy("all") ===
      ManifestPrune.StatsAll)
    assert(ManifestPrune.parseStatsPolicy("none") ===
      ManifestPrune.StatsNone)
    assert(ManifestPrune.parseStatsPolicy("include:a, b") ===
      ManifestPrune.StatsInclude(Set("a", "b")))
    assert(ManifestPrune.parseStatsPolicy("exclude:text") ===
      ManifestPrune.StatsExclude(Set("text")))
    intercept[IllegalArgumentException] {
      ManifestPrune.parseStatsPolicy("most")
    }
    assert(ManifestPrune.StatsNone.admits("x") === false)
    assert(ManifestPrune.StatsExclude(Set("x")).admits("y"))
  }

  test("exclude:lang — the excluded column loses its cstats entry, " +
    "its metadata aggregate refuses (exact fallback), its predicate " +
    "stops pruning; included columns keep pushing") {
    ensureCatalog()
    val suf = System.nanoTime
    val r = Tables.matDir(s"spol_ex_$suf", spark, sf0001)
    val tbl = s"spol.ex_$suf"
    spark.sql(s"""CREATE TABLE graft.$tbl (
                 |  doc_id BIGINT, lang STRING, n_chars BIGINT)
                 |USING graft LOCATION '$r'
                 |TBLPROPERTIES ('cluster'='n_chars|n_chars,doc_id',
                 |  'key'='doc_id',
                 |  'stats.columns'='exclude:lang')""".stripMargin)
    docs.select("doc_id", "lang", "n_chars")
      .createOrReplaceTempView(s"spol_src_$suf")
    spark.sql(s"INSERT INTO graft.$tbl " +
      s"SELECT doc_id, lang, n_chars FROM spol_src_$suf")

    // the manifest's committed rows carry no lang entry
    val head = ManifestPrune.currentVersion(spark, r)
    val m = spark.read.parquet(ManifestPrune.manifestOf(r, head))
    assert(m.filter(col("n_rows") > 0)
      .filter(col("cstats_str").getItem("lang").isNotNull)
      .count() === 0, "excluded column must not be statted")
    // included long column still statted
    assert(m.filter(col("n_rows") > 0)
      .filter(col("cstats_long").getItem("doc_id").isNull)
      .count() === 0, "included column must be statted")

    // metadata aggregate on the excluded column refuses; the scan
    // fallback stays exact
    val qe = spark.sql(s"SELECT min(lang) AS lo FROM graft.$tbl")
    assert(!qe.queryExecution.executedPlan.toString
      .contains("graft-chain-agg"))
    assert(qe.collect().head.getString(0) ===
      docs.agg(min("lang")).head.getString(0))
    // ...while the included column answers from metadata
    val qi = spark.sql(s"SELECT min(doc_id) AS lo FROM graft.$tbl")
    assert(qi.queryExecution.executedPlan.toString
      .contains("graft-chain-agg"))
    assert(qi.collect().head.getLong(0) ===
      docs.agg(min("doc_id")).head.getLong(0))

    // a predicate on the excluded column stays exact (rows right),
    // it just can't prune
    val lang0 = docs.select("lang").orderBy("lang").limit(1)
      .collect().head.getString(0)
    val qp = spark.sql(s"SELECT count(*) AS n FROM graft.$tbl " +
      s"WHERE lang = '$lang0'")
    assert(qp.collect().head.getLong(0) ===
      docs.filter(col("lang") === lang0).count())

    // DESCRIBE surfaces the policy
    val props = spark.sql(s"DESCRIBE TABLE EXTENDED graft.$tbl")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(props.contains("exclude:lang"), props.takeRight(400))
  }

  test("ALTER TABLE SET TBLPROPERTIES('stats.columns'='none') " +
    "applies to later commits only: the next append's rows carry no " +
    "cstats, so a snapshot-spanning metadata aggregate refuses " +
    "(coverage gap) while the spec key keeps its min/max pruning") {
    ensureCatalog()
    val suf = System.nanoTime
    val r = Tables.matDir(s"spol_alt_$suf", spark, sf0001)
    ManifestPrune.buildLayout(docs.select("doc_id", "lang", "n_chars"),
      r, nFiles = 4)
    val tbl = s"spol.alt_$suf"
    GraftCatalog.registerTable(tbl, r)
    // full stats at v0: doc_id pushes
    val q0 = spark.sql(s"SELECT max(doc_id) AS hi FROM graft.$tbl")
    assert(q0.queryExecution.executedPlan.toString
      .contains("graft-chain-agg"))

    spark.sql(s"ALTER TABLE graft.$tbl " +
      "SET TBLPROPERTIES('stats.columns'='none')")
    val second = docs.orderBy("doc_id").limit(500)
      .select((col("doc_id") + 91000000L).as("doc_id"), col("lang"),
        col("n_chars"))
    second.createOrReplaceTempView(s"spol_alt_src_$suf")
    spark.sql(s"INSERT INTO graft.$tbl " +
      s"SELECT * FROM spol_alt_src_$suf")

    // the new generation has no doc_id entry — all-or-nothing refusal
    val q1 = spark.sql(s"SELECT max(doc_id) AS hi FROM graft.$tbl")
    assert(!q1.queryExecution.executedPlan.toString
      .contains("graft-chain-agg"),
      "coverage gap must refuse the metadata aggregate")
    assert(q1.collect().head.getLong(0) ===
      docs.agg(max(col("doc_id") + 91000000L)).head.getLong(0))
    // COUNT(*) never needed cstats — still metadata-only
    val qc = spark.sql(s"SELECT count(*) AS n FROM graft.$tbl")
    assert(qc.queryExecution.executedPlan.toString
      .contains("graft-chain-agg"))
    assert(qc.collect().head.getLong(0) === docs.count() + 500)
    // the spec's own key column is statted regardless of policy:
    // min_key/max_key pruning on n_chars still fires
    val q2 = spark.sql(s"SELECT count(*) AS n FROM graft.$tbl " +
      "WHERE n_chars BETWEEN 120 AND 200")
    assert(q2.collect().head.getLong(0) ===
      docs.filter(col("n_chars").between(120, 200)).count() +
        second.filter(col("n_chars").between(120, 200)).count())
  }
}
