package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** PER-COLUMN FILE STATISTICS (Iceberg column-stats parity): every
  * chain manifest row carries `cstats_long` / `cstats_str` maps —
  * min/max/null-count for EVERY supported column of the file, not
  * just the clustering spec's key — so a WHERE on any column prunes
  * files whose recorded range provably cannot match. The multiplying
  * case is a composite predicate: `lang = 'de' AND n_chars < y` on a
  * (lang, n_chars)-clustered layout prunes by BOTH dimensions, and a
  * Z-ordered layout finally prunes on every interleaved axis. */
class ColStatsSpec extends SparkSpec {

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)

  private def docs: DataFrame =
    Tables.load(spark, sf0001, "documents")

  private def chainScans(df: DataFrame): Seq[BatchScanExec] = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[BatchScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => walk(a.executedPlan)
      case qs: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => walk(qs.plan)
      case b: BatchScanExec
          if b.scan.description().startsWith("graft-chain") => Seq(b)
      case other => other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  private def planned(df: DataFrame): Int =
    chainScans(df).head.inputPartitions.length

  test("a predicate on a NON-clustering column prunes through the " +
    "per-file column stats, and a composite predicate multiplies " +
    "both dimensions' selectivity") {
    ensureCatalog()
    val d = Tables.load(spark, sf001, "documents")
    val root = Tables.matDir(s"cstats_multi_${System.nanoTime}",
      spark, sf001)
    // clustered (lang, n_chars): the spec stats n_chars (buildLayout
    // default), so any lang pruning observed can ONLY come from the
    // column-stats maps
    ManifestPrune.buildLayout(d, root, nFiles = 16,
      clusterCols = Seq("lang", "n_chars"))
    val tbl = s"cst.multi_${System.nanoTime}"
    GraftCatalog.registerTable(tbl, root)

    val langOnly = spark.sql(s"SELECT doc_id, lang, n_chars " +
      s"FROM graft.$tbl WHERE lang = 'en'")
    val pLang = planned(langOnly)
    assert(pLang < 16 && pLang > 0,
      s"expected lang='en' to prune via cstats_str, planned=$pLang")
    assert(langOnly.collect().map(_.toSeq).sortBy(_.toString) ===
      d.filter(col("lang") === "en")
        .select("doc_id", "lang", "n_chars")
        .collect().map(_.toSeq).sortBy(_.toString))

    // the composite predicate prunes STRICTLY more: within the 'en'
    // band the layout is n_chars-ordered, so the cstats_long entry
    // subdivides what the string predicate kept
    val both = spark.sql(s"SELECT doc_id, lang, n_chars " +
      s"FROM graft.$tbl WHERE lang = 'en' AND n_chars < 150")
    val pBoth = planned(both)
    assert(pBoth < pLang,
      s"expected n_chars<150 to subdivide the en band: $pBoth vs $pLang")
    assert(both.collect().map(_.toSeq).sortBy(_.toString) ===
      d.filter(col("lang") === "en" && col("n_chars") < 150)
        .select("doc_id", "lang", "n_chars")
        .collect().map(_.toSeq).sortBy(_.toString))
  }

  test("all-NULL column files prune (a range predicate cannot match " +
    "a null); files with a partial null population are kept") {
    ensureCatalog()
    val root = Tables.matDir(s"cstats_null_${System.nanoTime}",
      spark, sf0001)
    // low-n_chars files carry ONLY null lang; clustering by n_chars
    // makes the null population file-aligned
    val d = docs.withColumn("lang",
      when(col("n_chars") < 200, lit(null).cast("string"))
        .otherwise(col("lang")))
    ManifestPrune.buildLayout(d, root, nFiles = 8)
    val tbl = s"cst.nulls_${System.nanoTime}"
    GraftCatalog.registerTable(tbl, root)
    val q = spark.sql(s"SELECT doc_id, lang FROM graft.$tbl " +
      "WHERE lang >= 'a'")
    val p = planned(q)
    assert(p < 8 && p > 0,
      s"expected the all-null-lang files pruned, planned=$p")
    assert(q.collect().map(_.toSeq).sortBy(_.toString) ===
      d.filter(col("lang") >= "a").select("doc_id", "lang")
        .collect().map(_.toSeq).sortBy(_.toString))
  }

  test("string bounds follow the truncation rule: lo is a sound " +
    "64-char prefix, hi is null (+inf) when the max exceeds the " +
    "budget — long-text predicates stay exact and never mis-prune") {
    ensureCatalog()
    val root = Tables.matDir(s"cstats_trunc_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    val m = spark.read.parquet(s"$root/manifest")
      .select(col("cstats_str").getItem("text").as("t"),
        col("n_rows"))
      .collect()
    m.foreach { r =>
      val t = r.getStruct(0)
      assert(t.getString(0) != null && t.getString(0).length <= 64,
        "lo must be a truncated prefix")
      // sf0.001 documents carry texts > 64 chars in every file
      assert(t.isNullAt(1), "hi must be +inf when max exceeds 64 chars")
    }
    val tbl = s"cst.trunc_${System.nanoTime}"
    GraftCatalog.registerTable(tbl, root)
    val probe = docs.select("text").orderBy("text").limit(1)
      .collect().head.getString(0) // the global min text
    val q = spark.sql(s"SELECT count(*) AS n FROM graft.$tbl " +
      s"WHERE text > '${probe.replace("'", "''")}'")
    assert(q.head().getLong(0) ===
      docs.filter(col("text") > probe).count())
  }

  test("rows without stats are always kept: the DDL create " +
    "placeholder (no cstats) and pre-cstats manifest rows read as " +
    "null maps and never prune — inserts stay visible under any " +
    "pushed predicate") {
    ensureCatalog()
    val suf = System.nanoTime
    val r = Tables.matDir(s"cstats_ddl_$suf", spark, sf0001)
    val tbl = s"cst.ddl_$suf"
    spark.sql(s"""CREATE TABLE graft.$tbl (
                 |  doc_id BIGINT, lang STRING, n_chars BIGINT)
                 |USING graft LOCATION '$r'
                 |TBLPROPERTIES ('key'='doc_id')""".stripMargin)
    docs.select("doc_id", "lang", "n_chars")
      .createOrReplaceTempView(s"cstats_src_$suf")
    spark.sql(s"INSERT INTO graft.$tbl " +
      s"SELECT doc_id, lang, n_chars FROM cstats_src_$suf")
    val q = spark.sql(s"SELECT count(*) AS n FROM graft.$tbl " +
      "WHERE lang = 'fr' AND doc_id % 2 = 0")
    assert(q.head().getLong(0) ===
      docs.filter(col("lang") === "fr" && col("doc_id") % 2 === 0)
        .count())
  }

  test("schema evolution gaps refuse metadata aggregates: after ADD " +
    "COLUMN, files written before the column have no stats entry — " +
    "MIN/COUNT on it must fall back to an exact scan, not answer " +
    "from the covered files alone") {
    ensureCatalog()
    val suf = System.nanoTime
    val r = Tables.matDir(s"cstats_evo_$suf", spark, sf0001)
    val tbl = s"cst.evo_$suf"
    spark.sql(s"""CREATE TABLE graft.$tbl (
                 |  doc_id BIGINT, n_chars BIGINT)
                 |USING graft LOCATION '$r'
                 |TBLPROPERTIES ('cluster'='n_chars|n_chars,doc_id',
                 |  'key'='doc_id')""".stripMargin)
    docs.select("doc_id", "n_chars")
      .createOrReplaceTempView(s"cstats_evo_a_$suf")
    spark.sql(s"INSERT INTO graft.$tbl " +
      s"SELECT doc_id, n_chars FROM cstats_evo_a_$suf")
    spark.sql(s"ALTER TABLE graft.$tbl ADD COLUMN extra BIGINT")
    docs.select((col("doc_id") + 90000000L).as("doc_id"),
        col("n_chars"), (col("n_chars") * 2).as("extra"))
      .createOrReplaceTempView(s"cstats_evo_b_$suf")
    spark.sql(s"INSERT INTO graft.$tbl " +
      s"SELECT doc_id, n_chars, extra FROM cstats_evo_b_$suf")

    val q = spark.sql(
      s"SELECT min(extra) AS lo, count(extra) AS n FROM graft.$tbl")
    // the old files carry no 'extra' entry — pushdown must refuse
    assert(!q.queryExecution.executedPlan.toString
      .contains("graft-chain-agg"))
    val row = q.collect().head
    assert(row.getLong(0) ===
      docs.agg(min(col("n_chars") * 2)).head.getLong(0))
    assert(row.getLong(1) === docs.count()) // nulls in old files
    // doc_id spans BOTH generations and stays pushable
    val q2 = spark.sql(s"SELECT max(doc_id) AS hi FROM graft.$tbl")
    assert(q2.queryExecution.executedPlan.toString
      .contains("graft-chain-agg"))
    assert(q2.collect().head.getLong(0) ===
      docs.agg(max(col("doc_id") + 90000000L)).head.getLong(0))
  }

  test("reported column statistics reach Catalyst under CBO: the " +
    "optimized plan's attributeStats carry the manifest's exact " +
    "min/max/nullCount — a graft table looks freshly ANALYZEd for " +
    "free; strings report nullCount only (their minima are " +
    "truncated prefixes); DV sidecars withdraw the exactness claim") {
    ensureCatalog()
    val root = Tables.matDir(s"cstats_cbo_${System.nanoTime}",
      spark, sf0001)
    val d = docs.withColumn("lang",
      when(col("doc_id") % 5 === 0, lit(null).cast("string"))
        .otherwise(col("lang")))
    ManifestPrune.buildLayout(d, root, nFiles = 4)
    val tbl = s"cst.cbo_${System.nanoTime}"
    GraftCatalog.registerTable(tbl, root)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val q = spark.sql(s"SELECT doc_id, lang FROM graft.$tbl " +
        "WHERE doc_id > 0")
      val stats = q.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r.stats
      }.get
      val byName = stats.attributeStats.map { case (a, cs) =>
        a.name -> cs }
      assert(byName.contains("doc_id") && byName.contains("lang"),
        s"expected reported column stats, got ${byName.keySet}")
      val idStat = byName("doc_id")
      assert(idStat.min === Some(
        d.agg(min("doc_id")).head.getLong(0)))
      assert(idStat.max === Some(
        d.agg(max("doc_id")).head.getLong(0)))
      assert(idStat.nullCount === Some(BigInt(0)))
      val langStat = byName("lang")
      assert(langStat.nullCount ===
        Some(BigInt(d.filter(col("lang").isNull).count())))
      assert(langStat.min.isEmpty && langStat.max.isEmpty)

      // hidden rows withdraw the exactness claim: after a DV delete
      // the scan reports NO column stats (a hidden row could be the
      // extreme or a null)
      ManifestPrune.dvDeleteCommit(spark, root,
        d.filter(col("doc_id") % 2 === 0).select("doc_id"))
      val q2 = spark.sql(s"SELECT doc_id FROM graft.$tbl " +
        "WHERE doc_id > 0")
      val stats2 = q2.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r.stats
      }.get
      assert(stats2.attributeStats.isEmpty)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("a Z-ordered chain prunes on BOTH interleaved dimensions " +
    "through the column stats — the layout promise z-order makes") {
    ensureCatalog()
    val ev = Tables.load(spark, sf001, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"))
    val r = ev.agg(min("user_id"), max("user_id"),
      min("us"), max("us")).head
    val (uMin, uMax, tMin, tMax) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val z = ev
      .withColumn("ub",
        ((col("user_id") - uMin) * 255L / (uMax - uMin)).cast("long"))
      .withColumn("tb",
        ((col("us") - tMin) * 255L / (tMax - tMin)).cast("long"))
      .withColumn("z", ZOrder.morton(col("ub"), col("tb"), 8))
      .select("event_id", "user_id", "us", "ub", "tb", "z")
    val suf = System.nanoTime
    val root = Tables.matDir(s"cstats_z_$suf", spark, sf0001)
    val tbl = s"cst.z_$suf"
    spark.sql(s"""CREATE TABLE graft.$tbl (
                 |  event_id BIGINT, user_id BIGINT, us BIGINT,
                 |  ub BIGINT, tb BIGINT, z BIGINT)
                 |USING graft LOCATION '$root'
                 |TBLPROPERTIES ('cluster'='z|z', 'key'='event_id')""" .stripMargin)
    z.createOrReplaceTempView(s"cstats_z_src_$suf")
    spark.sql(s"INSERT INTO graft.$tbl SELECT * FROM cstats_z_src_$suf")
    // compact so the layout is genuinely z-clustered files
    spark.sql(s"CALL graft.system.compact(table => '$tbl', " +
      "target_files => 16)")
    def planOf(pred: String): (Int, Long) = {
      val q = spark.sql(
        s"SELECT count(*) AS n FROM graft.$tbl WHERE $pred")
      (planned(q), q.head().getLong(0))
    }
    val (pU, nU) = planOf("ub BETWEEN 0 AND 63")
    val (pT, nT) = planOf("tb BETWEEN 0 AND 63")
    assert(pU < 16 && pT < 16,
      s"both z dimensions must prune: ub=$pU tb=$pT of 16")
    assert(nU === z.filter(col("ub").between(0, 63)).count())
    assert(nT === z.filter(col("tb").between(0, 63)).count())
    // the 2-D corner multiplies
    val (pUT, nUT) = planOf("ub BETWEEN 0 AND 63 AND tb BETWEEN 0 AND 63")
    assert(pUT <= pU.min(pT))
    assert(nUT === z.filter(col("ub").between(0, 63) &&
      col("tb").between(0, 63)).count())
  }

  test("filtered scans under CBO stay self-consistent: snapshot-" +
    "global column stats ride with the UNFILTERED row count (the " +
    "predicate stays residual, Catalyst derives the reduction once " +
    "from min/max) — nullCount can never exceed rowCount, and the " +
    "CBO-off row count keeps the pruned estimate") {
    ensureCatalog()
    val root = Tables.matDir(s"cstats_consist_${System.nanoTime}",
      spark, sf0001)
    val d = docs.withColumn("lang",
      when(col("doc_id") % 3 === 0, lit(null).cast("string"))
        .otherwise(col("lang")))
    ManifestPrune.buildLayout(d, root, nFiles = 8)
    val tbl = s"cst.consist_${System.nanoTime}"
    GraftCatalog.registerTable(tbl, root)
    val nullLang = d.filter(col("lang").isNull).count()
    val total = d.count()
    val cut = d.agg(expr("percentile_approx(n_chars, 0.9)"))
      .head.getLong(0)
    def scanStats(cbo: Boolean) = {
      spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
      try {
        val q = spark.sql(s"SELECT doc_id, lang FROM graft.$tbl " +
          s"WHERE n_chars > $cut")
        q.queryExecution.optimizedPlan.collectFirst {
          case r: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2ScanRelation => r.stats
        }.get
      } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    }
    val cboStats = scanStats(cbo = true)
    val byName = cboStats.attributeStats.map { case (a, cs) =>
      a.name -> cs }
    assert(byName.contains("lang"),
      s"expected column stats on the filtered CBO scan, " +
        s"got ${byName.keySet}")
    assert(cboStats.rowCount === Some(BigInt(total)),
      "column stats must ride the unfiltered snapshot count")
    assert(byName("lang").nullCount === Some(BigInt(nullLang)))
    assert(byName("lang").nullCount.get <= cboStats.rowCount.get)
    // CBO off: no column stats, and the row count stays the pruned
    // (smaller) post-skipping estimate broadcast decisions rely on
    val offStats = scanStats(cbo = false)
    assert(offStats.attributeStats.isEmpty)
    assert(offStats.rowCount.forall(_ < BigInt(total)),
      s"pruned estimate expected, got ${offStats.rowCount}")
  }

  test("NDV reaches Catalyst: per-file HLL sketches (lgK=12) union " +
    "at read into attributeStats.distinctCount — within sketch error " +
    "on a unique key, exact on a low-cardinality string; a coverage " +
    "gap (pre-NDV generation) withdraws the claim, not the rest") {
    ensureCatalog()
    val root = Tables.matDir(s"cstats_ndv_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 6)
    val tbl = s"cst.ndv_${System.nanoTime}"
    GraftCatalog.registerTable(tbl, root)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val q = spark.sql(
        s"SELECT doc_id, lang, n_chars FROM graft.$tbl")
      val byName = q.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r.stats
      }.get.attributeStats.map { case (a, cs) => a.name -> cs }
      val nDocs = docs.count()
      val idNdv = byName("doc_id").distinctCount.get.toLong
      assert(math.abs(idNdv - nDocs).toDouble / nDocs < 0.05,
        s"doc_id NDV $idNdv vs true $nDocs (unique key)")
      val langTrue = docs.select("lang").distinct().count()
      assert(byName("lang").distinctCount.get.toLong === langTrue,
        "HLL is exact at trivially low cardinality")
      val ncTrue = docs.select("n_chars").distinct().count()
      val ncNdv = byName("n_chars").distinctCount.get.toLong
      assert(math.abs(ncNdv - ncTrue).toDouble / ncTrue < 0.05,
        s"n_chars NDV $ncNdv vs true $ncTrue")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("exact stats CHANGE the chosen plan: under CBO the equality " +
    "filter's 1/NDV selectivity shrinks the probe side below the " +
    "broadcast threshold — BroadcastHashJoin; with CBO off the " +
    "filtered size is unreduced — SortMergeJoin. Same rows either " +
    "way (the stats steer, never decide results)") {
    ensureCatalog()
    val suf = System.nanoTime
    val rootA = Tables.matDir(s"cstats_flip_a_$suf", spark, sf0001)
    val rootB = Tables.matDir(s"cstats_flip_b_$suf", spark, sf0001)
    ManifestPrune.buildLayout(docs.select("doc_id", "n_chars"),
      rootA, nFiles = 4, clusterCols = Seq("doc_id"))
    ManifestPrune.buildLayout(
      docs.select("doc_id", "lang", "source", "n_chars"),
      rootB, nFiles = 4, clusterCols = Seq("doc_id"))
    val ta = s"cst.flipa_$suf"
    val tb = s"cst.flipb_$suf"
    GraftCatalog.registerTable(ta, rootA)
    GraftCatalog.registerTable(tb, rootB)
    // a real n_chars value; selectivity 1/NDV(n_chars) cuts the
    // estimate by two orders of magnitude on this data
    val v = docs.agg(min("n_chars")).head.getLong(0)
    val widthA = 8 + 8 // doc_id, n_chars defaultSize
    val fullA = docs.count() * widthA
    val threshold = (fullA / 8).max(256)
    val sql = s"""SELECT a.doc_id, a.n_chars, b.lang
                 |FROM graft.$ta a JOIN graft.$tb b
                 |  ON a.doc_id = b.doc_id
                 |WHERE a.n_chars = $v""".stripMargin
    def joinNodes(cbo: Boolean): (String, Array[String]) = {
      spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        threshold.toString)
      try {
        val q = spark.sql(sql)
        // the STATIC choice is the claim — AQE could later repair
        // either plan from runtime sizes
        val plan = q.queryExecution.sparkPlan
        val kind =
          if (plan.exists(_.isInstanceOf[org.apache.spark.sql
              .execution.joins.BroadcastHashJoinExec])) "broadcast"
          else if (plan.exists(_.isInstanceOf[org.apache.spark.sql
              .execution.joins.SortMergeJoinExec])) "sortmerge"
          else "other"
        (kind, q.collect().map(_.mkString("|")).sorted)
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.cbo.enabled", "false")
      }
    }
    val (kOn, rowsOn) = joinNodes(cbo = true)
    val (kOff, rowsOff) = joinNodes(cbo = false)
    assert(kOn === "broadcast",
      s"CBO + NDV must estimate the filtered side tiny, got $kOn")
    assert(kOff === "sortmerge",
      s"without stats the filtered size is unreduced, got $kOff")
    assert(rowsOn === rowsOff)
    assert(rowsOn.nonEmpty)
  }
}
