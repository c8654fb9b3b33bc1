package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.{col, count, lit}

/** `CALL graft.system.<proc>(…)` — the maintenance surface in pure
  * SQL on Spark 4's ProcedureCatalog face. Each procedure resolves the
  * table through the SAME catalog lookup SELECT uses and returns a
  * one-row LocalScan, so the whole lifecycle (tag → compact → expire
  * → restore → branch → fast-forward) is drivable by an analyst with
  * nothing but SQL. */
class GraftSqlProcedureSpec extends SparkSpec {

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)

  private def freshChain(tag: String): (String, String) = {
    val root = Tables.matDir(s"proc_${tag}_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(
      spark.read.parquet(s"$sf0001/documents.parquet"), root, nFiles = 4)
    val tbl = s"prc.${tag}_${System.nanoTime}"
    GraftCatalog.registerTable(tbl, root)
    (tbl, root)
  }

  private def call(sql: String): Array[org.apache.spark.sql.Row] =
    spark.sql(sql).collect()

  test("create_tag defaults to head; drop_tag reports existence") {
    ensureCatalog()
    val (tbl, root) = freshChain("tag")
    val r = call(s"CALL graft.system.create_tag(table => '$tbl', " +
      "name => 'train1')")
    assert(r.map(_.getLong(0)).toSeq === Seq(0L))
    assert(ManifestPrune.taggedVersion(root, "train1") === Some(0L))
    assert(call(s"CALL graft.system.drop_tag(table => '$tbl', " +
      "name => 'train1')").head.getBoolean(0))
    assert(!call(s"CALL graft.system.drop_tag(table => '$tbl', " +
      "name => 'train1')").head.getBoolean(0))
  }

  test("compact commits a new version; expire_versions dry_run " +
    "previews without deleting, then the real run destroys") {
    ensureCatalog()
    val (tbl, root) = freshChain("cmp")
    val v1 = call(s"CALL graft.system.compact(table => '$tbl', " +
      "target_files => 2)").head.getLong(0)
    assert(v1 === 1L)
    // dry run: would remove v0's manifests/files, touches nothing
    val dry = call("CALL graft.system.expire_versions(" +
      s"table => '$tbl', keep_last => 1, grace_ms => 0, " +
      "dry_run => true)").head
    assert(dry.getString(0) === "1")
    assert(dry.getLong(2) >= 1L)     // manifest dirs it WOULD remove
    assert(dry.getBoolean(5))
    assert(ChainStorage.forPath(root)
      .isPublished(s"$root/manifest"), "dry run must not delete")
    // the real run removes v0's unshared state
    val real = call("CALL graft.system.expire_versions(" +
      s"table => '$tbl', keep_last => 1, grace_ms => 0)").head
    assert(real.getString(0) === "1")
    assert(real.getLong(2) === dry.getLong(2))
    assert(!real.getBoolean(5))
    // table still reads fine at head
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.$tbl")
      .head().getLong(0) ===
      spark.read.parquet(s"$sf0001/documents.parquet").count())
  }

  test("restore publishes an older version as the new head") {
    ensureCatalog()
    val (tbl, _) = freshChain("rst")
    val before = spark.sql(s"SELECT count(*) FROM graft.$tbl")
      .head().getLong(0)
    call(s"CALL graft.system.compact(table => '$tbl', " +
      "target_files => 1)")
    spark.sql(s"DELETE FROM graft.$tbl WHERE doc_id % 2 = 0")
    val v3 = call(s"CALL graft.system.restore(table => '$tbl', " +
      "version => 1)").head.getLong(0)
    assert(v3 === 3L)
    assert(spark.sql(s"SELECT count(*) FROM graft.$tbl")
      .head().getLong(0) === before)
  }

  test("create_branch / fast_forward / drop_branch round-trip in SQL") {
    ensureCatalog()
    val (tbl, root) = freshChain("br")
    val broot = call("CALL graft.system.create_branch(" +
      s"table => '$tbl', name => 'audit')").head.getString(0)
    assert(broot === ManifestPrune.branchRoot(root, "audit"))
    // a branch-side commit, then publish to main by fast-forward
    val add = spark.range(1).selectExpr(
      "CAST(97000001 AS BIGINT) AS doc_id", "'branch row' AS text",
      "'br' AS lang", "'proc' AS source", "CAST(10 AS BIGINT) AS n_chars")
    ManifestPrune.appendCommit(spark, broot, add)
    val v = call("CALL graft.system.fast_forward(" +
      s"table => '$tbl', branch => 'audit')").head.getLong(0)
    assert(v === 1L)
    assert(spark.sql(s"SELECT count(*) FROM graft.$tbl " +
      "WHERE doc_id = 97000001").head().getLong(0) === 1L)
    // guarded teardown refuses while live versions still reference
    // branch-owned files…
    val e = intercept[Exception] {
      call("CALL graft.system.drop_branch(" +
        s"table => '$tbl', name => 'audit')")
    }
    assert(e.getMessage.contains("references data files"))
    // …and succeeds after the documented lifecycle: compact (rehomes
    // live rows into main-owned files) + expire the pre-compaction
    // versions that still point into the branch
    call(s"CALL graft.system.compact(table => '$tbl', " +
      "target_files => 2)")
    call("CALL graft.system.expire_versions(" +
      s"table => '$tbl', keep_last => 1, grace_ms => 0)")
    assert(call("CALL graft.system.drop_branch(" +
      s"table => '$tbl', name => 'audit')").head.getBoolean(0))
  }

  test("evolve_clustering registers a new spec through CALL") {
    ensureCatalog()
    val (tbl, root) = freshChain("spc")
    val v = call("CALL graft.system.evolve_clustering(" +
      s"table => '$tbl', stats_col => 'n_chars', " +
      "cluster_cols => 'n_chars,doc_id')").head.getLong(0)
    assert(v === 1L)
    assert(ManifestPrune.specOfVersion(root, v).statsCol === "n_chars")
  }

  test("clone / detach_clone round-trip in SQL; the clone is a " +
    "zero-copy first-class table; TRUNCATE TABLE rides the delete " +
    "face") {
    ensureCatalog()
    val (tbl, root) = freshChain("clone")
    val dst = Tables.matDir(s"proc_clone_dst_${System.nanoTime}",
      spark, sf0001)
    // matDir creates the dir; cloneTable wants to create it itself
    ChainStorage.forPath(dst).deleteTree(dst)
    val as = s"prc.cl_${System.nanoTime}"
    val r = call(s"CALL graft.system.clone(table => '$tbl', " +
      s"location => '$dst', as_table => '$as')")
    assert(r.head.getString(0) === dst)
    val base = spark.sql(s"SELECT count(*) AS n FROM graft.$tbl")
      .collect().head.getLong(0)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.$as")
      .collect().head.getLong(0) === base)
    // the clone is independent: deleting there leaves the source
    spark.sql(s"DELETE FROM graft.$as WHERE doc_id % 2 = 0")
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.$tbl")
      .collect().head.getLong(0) === base)
    assert(call(s"CALL graft.system.detach_clone(table => '$tbl', " +
      s"location => '$dst')").head.getBoolean(0))

    // TRUNCATE TABLE → unconditional merge-on-read delete
    spark.sql(s"TRUNCATE TABLE graft.$tbl")
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.$tbl")
      .collect().head.getLong(0) === 0L)
    // the pre-truncate contents remain one version back
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.$tbl " +
      "VERSION AS OF 0").collect().head.getLong(0) === base)
  }

  test("clone(as_table) inherits the SOURCE table's merge key — SQL " +
    "UPDATE on a clone of a non-doc_id-keyed table merges on the " +
    "registered key, not a hardcoded default") {
    ensureCatalog()
    val root = Tables.matDir(s"proc_clonekey_${System.nanoTime}",
      spark, sf0001)
    // a chain keyed on k_id (≠ doc_id): the regression is invisible
    // on doc_id-keyed tables
    ManifestPrune.buildLayout(
      spark.read.parquet(s"$sf0001/documents.parquet")
        .withColumnRenamed("doc_id", "k_id"), root, nFiles = 4,
      clusterCols = Seq("n_chars", "k_id"))
    val tbl = s"prc.ck_${System.nanoTime}"
    GraftCatalog.registerTable(tbl, root, key = "k_id")
    val dst = Tables.matDir(s"proc_clonekey_dst_${System.nanoTime}",
      spark, sf0001)
    ChainStorage.forPath(dst).deleteTree(dst)
    val as = s"prc.ckc_${System.nanoTime}"
    call(s"CALL graft.system.clone(table => '$tbl', " +
      s"location => '$dst', as_table => '$as')")
    assert(GraftCatalog.lookup(as).map(_._2) === Some("k_id"))
    // and the key actually drives DML: an UPDATE touches exactly the
    // matched keys (an upsert merged on the wrong key would duplicate
    // or clobber rows)
    val n = spark.sql(s"SELECT count(*) AS n FROM graft.$as")
      .head().getLong(0)
    spark.sql(s"UPDATE graft.$as SET lang = 'xx' WHERE k_id % 10 = 3")
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.$as")
      .head().getLong(0) === n)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.$as " +
      "WHERE lang = 'xx'").head().getLong(0) ===
      spark.sql(s"SELECT count(*) AS n FROM graft.$tbl " +
        "WHERE k_id % 10 = 3").head().getLong(0))
  }

  test("graft.db.t.refs lists tags and branch heads") {
    ensureCatalog()
    val (tbl, root) = freshChain("refs")
    call(s"CALL graft.system.create_tag(table => '$tbl', " +
      "name => 'train1')")
    call(s"CALL graft.system.create_branch(table => '$tbl', " +
      "name => 'exp')")
    spark.sql(s"DELETE FROM graft.$tbl WHERE doc_id % 2 = 0") // v1
    val refs = spark.sql(s"SELECT name, type, version " +
      s"FROM graft.$tbl.refs ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2)))
    assert(refs === Array(("exp", "branch", 0L),
      ("train1", "tag", 0L)))
  }

  test("rewrite_grouped makes every file single-group: GROUP BY " +
    "pushdown refuses before the CALL, answers from metadata after, " +
    "with hash-identical results and DVs materialized") {
    ensureCatalog()
    val (tbl, root) = freshChain("rgrp")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // a DV first: the rewrite must materialize it (compaction rule)
    ManifestPrune.dvDeleteWhereCommit(spark, root,
      org.apache.spark.sql.functions.col("doc_id") % 7 === 0)
    val live = docs.filter(
      org.apache.spark.sql.functions.col("doc_id") % 7 =!= 0)
    val gq = s"SELECT lang, count(*) AS n, sum(n_chars) AS s " +
      s"FROM graft.$tbl GROUP BY lang ORDER BY lang"
    val before = spark.sql(gq)
    assert(!before.queryExecution.executedPlan.toString
      .contains("graft-chain-agg"),
      "mixed-lang files (plus a DV) must refuse GROUP BY pushdown")
    val beforeRows = before.collect().map(_.toSeq).toSeq

    val v = call(s"CALL graft.system.rewrite_grouped(" +
      s"table => '$tbl', column => 'lang', target_files => 6)")
    assert(v.head.getLong(0) >= 2L)
    // every manifest row is now provably single-group in lang
    val m = spark.read.parquet(
      ManifestPrune.manifestOf(root, v.head.getLong(0)))
    val langStats = m
      .filter(org.apache.spark.sql.functions.col("n_rows") > 0)
      .select(org.apache.spark.sql.functions.col("cstats_str")
        .getItem("lang").as("e"))
      .collect()
    langStats.foreach { r =>
      val e = r.getStruct(0)
      assert(e != null && e.getString(0) === e.getString(1) &&
        e.getLong(2) === 0L,
        s"every rewritten file must be lang-constant, got $e")
    }
    val after = spark.sql(gq)
    assert(after.queryExecution.executedPlan.toString
      .contains("graft-chain-agg"),
      "the rewritten layout must arm metadata GROUP BY")
    assert(after.collect().map(_.toSeq).toSeq === beforeRows)
    assert(beforeRows === live.groupBy("lang")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("n_chars").as("s"))
      .orderBy("lang").collect().map(_.toSeq).toSeq)
  }

  test("rewrite_grouped folds equality deletes (compaction rule): " +
    "the new version carries no sidecar, GROUP BY pushes, and the " +
    "deleted keys stay gone; declared bucketing refuses loudly") {
    ensureCatalog()
    val (tbl, root) = freshChain("rgeq")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // an equality-delete commit (pure metadata), THEN the rewrite —
    // which reads committed rows (deletes folded) and must publish a
    // sidecar-free version so metadata aggregates are not refused
    ManifestPrune.eqDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 11 === 0).select("doc_id"))
    val v = ManifestPrune.rewriteGroupedCommit(spark, root, "lang", 4)
    assert(ManifestPrune.eqDelOf(root, v).isEmpty &&
      ManifestPrune.dvOf(root, v).isEmpty,
      "the rewrite must materialize sidecars, not carry them")
    val q = spark.sql(s"SELECT lang, count(*) AS n FROM graft.$tbl " +
      "GROUP BY lang ORDER BY lang")
    assert(q.queryExecution.executedPlan.toString
      .contains("graft-chain-agg"))
    val live = docs.filter(col("doc_id") % 11 =!= 0)
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      === live.groupBy("lang").agg(count(lit(1)).as("n"))
        .orderBy("lang")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq)

    // declared SPJ bucketing does not compose: loud refusal, not a
    // silently-dropped bucket layout
    val broot = graft.Tables.matDir(s"proc_rgbkt_${System.nanoTime}",
      spark, sf0001)
    SpjBucket.buildBucketedLayout(docs, broot, "doc_id", 4)
    val e = intercept[IllegalArgumentException] {
      ManifestPrune.rewriteGroupedCommit(spark, broot, "lang", 4)
    }
    assert(e.getMessage.contains("bucket"))
  }

  test("unknown procedure and unknown table fail cleanly") {
    ensureCatalog()
    val e1 = intercept[Exception] {
      spark.sql("CALL graft.system.nonsense()").collect()
    }
    assert(e1.getMessage.contains("nonsense"))
    val e2 = intercept[Exception] {
      spark.sql("CALL graft.system.compact(table => 'no.such', " +
        "target_files => 1)").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("table"))
  }
}
