package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** SQL DDL through the catalog: `CREATE TABLE graft.db.t (…) USING
  * graft` bootstraps an empty chain, `ALTER TABLE … ADD CONSTRAINT …
  * CHECK` registers an enforced constraint, inserts/selects run purely
  * through `spark.sql`, and — with a `warehouse` catalog option —
  * registrations persist as `_catalog` objects a FRESH session resolves
  * from disk (the restart contract). q_sql_ddl hash-gates the values;
  * this pins the DDL/durability contracts. */
class GraftSqlDdlSpec extends SparkSpec {

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)

  private def freshName(tag: String): String =
    s"ddl.${tag}_${System.nanoTime}"

  test("CREATE TABLE … USING graft LOCATION bootstraps an empty chain; " +
    "INSERT INTO / SELECT / DESCRIBE-visible CHECK constraint run " +
    "purely through spark.sql; violating rows are rejected until " +
    "DROP CONSTRAINT") {
    ensureCatalog()
    val tbl = freshName("t")
    val root = Tables.matDir(s"sqlddl_${System.nanoTime}", spark, sf0001)
    spark.sql(
      s"""CREATE TABLE graft.$tbl (
         |  doc_id BIGINT, text STRING, lang STRING, source STRING,
         |  n_chars BIGINT)
         |USING graft LOCATION '$root'
         |TBLPROPERTIES ('cluster'='doc_id|doc_id', 'key'='doc_id')
         |""".stripMargin)
    // empty chain is immediately selectable (version 0, zero rows)
    assert(spark.sql(s"SELECT * FROM graft.$tbl").count() === 0L)
    // the chain root carries the declared clustering spec
    assert(ChainStorage.forPath(root).isFile(s"$root/_specs/1"))

    spark.sql(s"ALTER TABLE graft.$tbl ADD CONSTRAINT chars_nonneg " +
      "CHECK (n_chars >= 0)")
    assert(ManifestPrune.listConstraints(root) ===
      Map("chars_nonneg" -> "n_chars >= 0"))

    spark.sql(s"INSERT INTO graft.$tbl VALUES " +
      "(1, 'one', 'en', 's0', 3), (2, 'two', 'de', 's0', 3)")
    val got = spark.sql(
      s"SELECT doc_id, lang, n_chars FROM graft.$tbl ORDER BY doc_id")
      .collect().map(_.toSeq)
    assert(got === Array(Seq(1L, "en", 3L), Seq(2L, "de", 3L)))

    // constraint enforced on the commit path: a violating INSERT fails
    // and commits nothing
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.$tbl VALUES (3, 'neg', 'en', 's0', -1)")
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" ")
    assert(msgs.contains("chars_nonneg"))
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.$tbl")
      .collect().head.getLong(0) === 2L)

    spark.sql(s"ALTER TABLE graft.$tbl DROP CONSTRAINT chars_nonneg")
    spark.sql(s"INSERT INTO graft.$tbl VALUES (3, 'neg', 'en', 's0', -1)")
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.$tbl")
      .collect().head.getLong(0) === 3L)

    assert(spark.sql("SHOW TABLES IN graft.ddl").collect()
      .map(_.getString(1)).contains(tbl.split("\\.").last))
    spark.sql(s"DROP TABLE graft.$tbl")
    intercept[Exception] { spark.sql(s"SELECT * FROM graft.$tbl").collect() }
  }

  test("PARTITIONED BY identity columns become the chain's clustering " +
    "spec; CREATE of an existing name fails") {
    ensureCatalog()
    val tbl = freshName("p")
    val root = Tables.matDir(s"sqlddlp_${System.nanoTime}", spark, sf0001)
    spark.sql(
      s"""CREATE TABLE graft.$tbl (doc_id BIGINT, lang STRING)
         |USING graft PARTITIONED BY (lang) LOCATION '$root'
         |""".stripMargin)
    val st = ChainStorage.forPath(root)
    assert(st.isFile(s"$root/_specs/1"))
    assert(st.read(s"$root/_specs/1").trim === "lang|lang")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.$tbl (x BIGINT) USING graft " +
        s"LOCATION '${root}_dup'")
    }
    assert(e.getMessage.toLowerCase.contains("exists"))
    spark.sql(s"DROP TABLE graft.$tbl")
  }

  test("CREATE TABLE AS SELECT through the catalog (non-atomic CTAS: " +
    "create + first append)") {
    ensureCatalog()
    val tbl = freshName("ctas")
    val root = Tables.matDir(s"sqlddlc_${System.nanoTime}", spark, sf0001)
    val docs = Tables.load(spark, sf0001, "documents")
    docs.createOrReplaceTempView("ctas_src")
    spark.sql(
      s"""CREATE TABLE graft.$tbl USING graft LOCATION '$root'
         |AS SELECT doc_id, lang, n_chars FROM ctas_src
         |WHERE doc_id % 5 = 2""".stripMargin)
    val expect = docs.filter(col("doc_id") % 5 === 2)
      .agg(count(lit(1)), sum("n_chars")).collect().head
    val got = spark.sql(
      s"SELECT count(*) AS n, sum(n_chars) AS s FROM graft.$tbl")
      .collect().head
    assert(got.getLong(0) === expect.getLong(0))
    assert(got.getLong(1) === expect.getLong(1))
    spark.sql(s"DROP TABLE graft.$tbl")
  }

  test("warehouse catalog: CREATE without LOCATION roots the chain " +
    "under <warehouse>/<db>/<t>; registration is durable — a fresh " +
    "session (cold in-memory registry) resolves SELECT from the " +
    "_catalog object, and DROP removes it") {
    val wh = Tables.matDir(s"sqlddlwh_${System.nanoTime}", spark, sf0001)
    val cat = s"gwh${System.nanoTime % 1000000}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val tbl = s"db1.t_${System.nanoTime}"
    spark.sql(s"CREATE TABLE $cat.$tbl (doc_id BIGINT, lang STRING) " +
      "USING graft")
    spark.sql(s"INSERT INTO $cat.$tbl VALUES (7, 'en'), (8, 'de')")
    // chain rooted under the warehouse
    val st = ChainStorage.forPath(wh)
    assert(st.isDir(s"$wh/${tbl.replace('.', '/')}"))
    assert(st.isFile(s"$wh/_catalog/$tbl"))

    // process restart: cold registry + a session whose catalog state
    // is rebuilt from conf (newSession drops runtime conf, as a fresh
    // process would)
    GraftCatalog.unregisterTable(tbl)
    val s2 = spark.newSession()
    s2.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val rows = s2.sql(s"SELECT doc_id, lang FROM $cat.$tbl ORDER BY doc_id")
      .collect().map(_.toSeq)
    assert(rows === Array(Seq(7L, "en"), Seq(8L, "de")))
    // SHOW TABLES / SHOW NAMESPACES see the durable registration even
    // on a cold registry
    GraftCatalog.unregisterTable(tbl)
    assert(s2.sql(s"SHOW TABLES IN $cat.db1").collect()
      .map(_.getString(1)).contains(tbl.split("\\.").last))
    GraftCatalog.unregisterTable(tbl)
    assert(s2.sql(s"SHOW NAMESPACES IN $cat").collect()
      .map(_.getString(0)).contains("db1"))

    // duplicate durable CREATE from a cold registry still fails (CAS)
    GraftCatalog.unregisterTable(tbl)
    val e = intercept[Exception] {
      s2.sql(s"CREATE TABLE $cat.$tbl (x BIGINT) USING graft")
    }
    assert(e.getMessage.toLowerCase.contains("exists"))

    s2.sql(s"DROP TABLE $cat.$tbl")
    assert(!st.isFile(s"$wh/_catalog/$tbl"))
    GraftCatalog.unregisterTable(tbl)
    intercept[Exception] { s2.sql(s"SELECT * FROM $cat.$tbl").collect() }
  }

  test("ALTER TABLE ADD COLUMN is a metadata-only declared-schema " +
    "commit: pre-evolution rows surface NULL, later inserts carry " +
    "values, the schema survives further commits, VERSION AS OF " +
    "before the evolution shows the old schema, and non-nullable " +
    "adds are refused") {
    ensureCatalog()
    val tbl = freshName("ac")
    val root = Tables.matDir(s"sqlddlac_${System.nanoTime}", spark, sf0001)
    spark.sql(s"CREATE TABLE graft.$tbl (doc_id BIGINT, n_chars BIGINT) " +
      s"USING graft LOCATION '$root'")
    spark.sql(s"INSERT INTO graft.$tbl VALUES (1, 3), (2, 4)")
    val vPre = ManifestPrune.currentVersion(spark, root)

    spark.sql(s"ALTER TABLE graft.$tbl ADD COLUMN note STRING")
    // metadata-only: same file set, kind classified as evolve-schema
    val hist = ManifestPrune.describeHistory(spark, root)
      .orderBy(col("version").desc).select("kind").head().getString(0)
    assert(hist === "evolve-schema")
    // old rows null-fill; new rows carry values
    spark.sql(s"INSERT INTO graft.$tbl VALUES (3, 5, 'tagged')")
    val got = spark.sql(
      s"SELECT doc_id, note FROM graft.$tbl ORDER BY doc_id")
      .collect().map(_.toSeq)
    assert(got === Array(Seq(1L, null), Seq(2L, null),
      Seq(3L, "tagged")))
    // the declared schema is carried by LATER commits (a DV delete
    // copies the pointer forward)
    spark.sql(s"DELETE FROM graft.$tbl WHERE doc_id = 1")
    assert(spark.sql(s"SELECT doc_id, note FROM graft.$tbl " +
      "ORDER BY doc_id").collect().map(_.toSeq) ===
      Array(Seq(2L, null), Seq(3L, "tagged")))
    // time travel to before the evolution: the OLD schema
    assert(spark.sql(
      s"SELECT * FROM graft.$tbl VERSION AS OF $vPre")
      .schema.fieldNames.toSeq === Seq("doc_id", "n_chars"))
    // duplicate and non-nullable adds are refused
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl ADD COLUMN note STRING")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl ADD COLUMN hard BIGINT NOT NULL")
    }
    spark.sql(s"DROP TABLE graft.$tbl")
  }

  test("ALTER TABLE RENAME COLUMN resolves files of every generation " +
    "(pre-rename physical name, post-rename logical name), refuses " +
    "name recycling, and follows the merge key") {
    ensureCatalog()
    val tbl = freshName("rn")
    val root = Tables.matDir(s"sqlddlrn_${System.nanoTime}", spark, sf0001)
    spark.sql(s"CREATE TABLE graft.$tbl (doc_id BIGINT, body STRING, " +
      s"n BIGINT) USING graft LOCATION '$root' " +
      "TBLPROPERTIES ('key'='doc_id')")
    spark.sql(s"INSERT INTO graft.$tbl VALUES (1, 'old gen', 10)")
    spark.sql(s"ALTER TABLE graft.$tbl RENAME COLUMN body TO content")
    spark.sql(s"INSERT INTO graft.$tbl VALUES (2, 'new gen', 20)")
    // both generations resolve under the logical name — the old
    // file's physical 'body' column rides the prior-name fallback
    assert(spark.sql(s"SELECT doc_id, content FROM graft.$tbl " +
      "ORDER BY doc_id").collect().map(_.toSeq) ===
      Array(Seq(1L, "old gen"), Seq(2L, "new gen")))
    // a second rename chains the priors: THREE physical generations
    spark.sql(s"ALTER TABLE graft.$tbl RENAME COLUMN content TO text")
    spark.sql(s"INSERT INTO graft.$tbl VALUES (3, 'third gen', 30)")
    assert(spark.sql(s"SELECT doc_id, text FROM graft.$tbl " +
      "ORDER BY doc_id").collect().map(_.toSeq) ===
      Array(Seq(1L, "old gen"), Seq(2L, "new gen"),
        Seq(3L, "third gen")))
    // names never recycle: old files still hold values under them
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl ADD COLUMN body STRING")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl RENAME COLUMN text TO content")
    }
    // a spec column refuses to rename until the spec evolves off it…
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl RENAME COLUMN doc_id TO id")
    }
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES " +
      "('cluster'='n|n')")
    // …then renaming the merge key re-registers it
    spark.sql(s"ALTER TABLE graft.$tbl RENAME COLUMN doc_id TO id")
    spark.sql(s"INSERT INTO graft.$tbl VALUES (4, 'fourth', 40)")
    assert(spark.sql(s"SELECT id FROM graft.$tbl WHERE text = 'fourth'")
      .head().getLong(0) === 4L)
    spark.sql(s"DROP TABLE graft.$tbl")
  }

  test("ALTER TABLE DROP COLUMN is metadata-only, retires the name " +
    "forever, and is refused for protected columns") {
    ensureCatalog()
    val tbl = freshName("dc")
    val root = Tables.matDir(s"sqlddldc_${System.nanoTime}", spark, sf0001)
    spark.sql(s"CREATE TABLE graft.$tbl (doc_id BIGINT, note STRING, " +
      s"n_chars BIGINT) USING graft LOCATION '$root' " +
      "TBLPROPERTIES ('key'='doc_id')")
    spark.sql(s"INSERT INTO graft.$tbl VALUES (1, 'kept?', 5)")
    val vPre = ManifestPrune.currentVersion(spark, root)
    spark.sql(s"ALTER TABLE graft.$tbl DROP COLUMN note")
    // metadata-only commit, classified as schema evolution
    assert(ManifestPrune.describeHistory(spark, root)
      .orderBy(col("version").desc).select("kind").head()
      .getString(0) === "evolve-schema")
    assert(spark.sql(s"SELECT * FROM graft.$tbl").schema.fieldNames
      .toSeq === Seq("doc_id", "n_chars"))
    // time travel still shows the column before the drop
    assert(spark.sql(s"SELECT note FROM graft.$tbl VERSION AS OF $vPre")
      .head().getString(0) === "kept?")
    // the name is retired: re-adding would resurrect stale values
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl ADD COLUMN note STRING")
    }
    assert(e.getMessage.contains("recycled") ||
      Option(e.getCause).exists(_.getMessage.contains("recycled")))
    // protected columns refuse: the merge key…
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl DROP COLUMN doc_id")
    }
    // …and a constraint-referenced column
    spark.sql(s"ALTER TABLE graft.$tbl ADD CONSTRAINT pos " +
      "CHECK (n_chars >= 0)")
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl DROP COLUMN n_chars")
    }
    assert(e2.getMessage.contains("constraint") ||
      Option(e2.getCause).exists(_.getMessage.contains("constraint")))
    spark.sql(s"DROP TABLE graft.$tbl")
  }

  test("RENAME TABLE moves both the in-memory and the durable " +
    "registration; the chain root is untouched") {
    val wh = Tables.matDir(s"sqlddlrn_${System.nanoTime}", spark, sf0001)
    val cat = s"grn${System.nanoTime % 1000000}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val a = s"db2.a_${System.nanoTime}"
    val b = s"db2.b_${System.nanoTime}"
    spark.sql(s"CREATE TABLE $cat.$a (doc_id BIGINT) USING graft")
    spark.sql(s"INSERT INTO $cat.$a VALUES (41)")
    spark.sql(s"ALTER TABLE $cat.$a RENAME TO $b")
    val st = ChainStorage.forPath(wh)
    assert(!st.isFile(s"$wh/_catalog/$a"))
    assert(st.isFile(s"$wh/_catalog/$b"))
    assert(spark.sql(s"SELECT doc_id FROM $cat.$b").collect()
      .head.getLong(0) === 41L)
    spark.sql(s"DROP TABLE $cat.$b")
  }
}
