package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STORAGE-PARTITIONED JOINS between chain tables: two chains built
  * bucketed on the same key through [[SpjBucket.buildBucketedLayout]]
  * join through plain SQL with ZERO Exchange on either side — the
  * scans report KeyGroupedPartitioning(bucket(N, key)), partitions
  * carry their bucket ids, and the catalog resolves the `bucket`
  * function so Spark can prove the two partitionings compatible.
  * Results are pinned against the plain (shuffled) join. */
class SpjJoinSpec extends SparkSpec {

  private def docs: DataFrame = Tables.load(spark, sf0001, "documents")
  private def embs: DataFrame =
    Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id").as("doc_id"), col("label"))

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)

  test("bucket function parity: the V2 bucket() reproduces the write " +
    "path's pmod(xxhash64(key), n) exactly") {
    val f = GraftBucketFunction.bind(org.apache.spark.sql.types
      .StructType(Seq(
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))))
      .asInstanceOf[GraftBoundBucket]
    val keys = docs.select("doc_id").limit(64)
      .collect().map(_.getLong(0))
    val viaSql = docs.limit(64)
      .select(col("doc_id"), SpjBucket.bucketCol("doc_id", 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    keys.foreach { k =>
      val row = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](8, k))
      assert(f.produceResult(row).intValue === viaSql(k),
        s"bucket mismatch for key $k")
    }
  }

  test("bucket function parity on INT keys: Spark's xxhash64 hashes " +
    "IntegerType through the 4-byte path, and the V2 function must " +
    "mirror that dispatch (hashLong of the widened value differs)") {
    import org.apache.spark.sql.types._
    val f = GraftBucketFunction.bind(StructType(Seq(
        StructField("n", IntegerType), StructField("k", IntegerType))))
      .asInstanceOf[GraftBoundBucket]
    import spark.implicits._
    // include negatives and the extremes — the widened-long hash
    // agrees with the int hash on NO interesting value
    val ints = (Seq(0, 1, -1, 42, -97, 65536, Int.MaxValue,
      Int.MinValue) ++ (1 to 48).map(_ * 7919)).map(Integer.valueOf)
    val viaSql = ints.map(_.intValue).toDF("k")
      .select(col("k"), SpjBucket.bucketCol("k", 8).as("b"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    ints.foreach { k =>
      val row = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](8, k.intValue))
      assert(f.produceResult(row).intValue === viaSql(k.intValue),
        s"bucket mismatch for int key $k")
    }
  }

  test("two co-bucketed chains join with zero Exchange; rows match " +
    "the plain join; a key-mismatched pair falls back to a shuffle") {
    ensureCatalog()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val rootA = Tables.matDir(s"spj_a_${System.nanoTime}", spark,
        sf0001)
      val rootB = Tables.matDir(s"spj_b_${System.nanoTime}", spark,
        sf0001)
      SpjBucket.buildBucketedLayout(docs, rootA, "doc_id", 8)
      SpjBucket.buildBucketedLayout(embs, rootB, "doc_id", 8,
        statsCol = "doc_id")
      val ta = s"spj.a_${System.nanoTime}"
      val tb = s"spj.b_${System.nanoTime}"
      GraftCatalog.registerTable(ta, rootA)
      GraftCatalog.registerTable(tb, rootB)

      val q = spark.sql(
        s"""SELECT a.lang, b.label, count(*) AS n,
           |  sum(a.n_chars) AS sum_chars
           |FROM graft.$ta a JOIN graft.$tb b ON a.doc_id = b.doc_id
           |GROUP BY a.lang, b.label ORDER BY a.lang, b.label"""
          .stripMargin)
      val got = q.collect().map(_.toSeq)

      val expect = docs.join(embs, "doc_id")
        .groupBy("lang", "label")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))
        .orderBy("lang", "label").collect().map(_.toSeq)
      assert(got === expect)

      // the SPJ claim: no shuffle between the two scans and the join
      // (inspect the FINAL plan only — AQE also prints the initial
      // one; the aggregate ABOVE the join may shuffle, so only the
      // text from the join down counts)
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("MergeJoin") ||
        plan.contains("ShuffledHashJoin"))
      val belowJoin = plan.substring(plan.indexOf("MergeJoin"))
      assert(!belowJoin.contains("Exchange hashpartitioning"),
        s"expected a shuffle-free storage-partitioned join:\n$plan")

      // honesty of the compatibility check: a 4-bucket build against
      // the 8-bucket one is NOT co-partitioned — the join must fall
      // back to shuffling, with identical rows
      val rootC = Tables.matDir(s"spj_c_${System.nanoTime}", spark,
        sf0001)
      SpjBucket.buildBucketedLayout(embs, rootC, "doc_id", 4,
        statsCol = "doc_id")
      val tc = s"spj.c_${System.nanoTime}"
      GraftCatalog.registerTable(tc, rootC)
      val q2 = spark.sql(
        s"""SELECT a.lang, c.label, count(*) AS n,
           |  sum(a.n_chars) AS sum_chars
           |FROM graft.$ta a JOIN graft.$tc c ON a.doc_id = c.doc_id
           |GROUP BY a.lang, c.label ORDER BY a.lang, c.label"""
          .stripMargin)
      assert(q2.collect().map(_.toSeq) === expect)
      val plan2 = q2.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val below2 = plan2.substring(
        plan2.indexOf("MergeJoin").max(plan2.indexOf("Join")))
      assert(below2.contains("Exchange hashpartitioning"),
        s"mismatched bucket counts must shuffle:\n$plan2")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("SPJ through DDL and the table lifecycle: CREATE TABLE " +
    "PARTITIONED BY (bucket(8, doc_id)) declares the bucketing, " +
    "INSERT fills it, DELETE masks rows, compact rewrites files — " +
    "and the join stays shuffle-free with exact rows throughout") {
    ensureCatalog()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val rootA = Tables.matDir(s"spjd_a_${System.nanoTime}", spark,
        sf0001)
      val rootB = Tables.matDir(s"spjd_b_${System.nanoTime}", spark,
        sf0001)
      val suf = System.nanoTime
      val ta = s"spj.da_$suf"
      val tb = s"spj.db_$suf"
      spark.sql(
        s"""CREATE TABLE graft.$ta (
           |  doc_id BIGINT, lang STRING, n_chars BIGINT)
           |USING graft
           |PARTITIONED BY (bucket(8, doc_id))
           |LOCATION '$rootA'
           |TBLPROPERTIES ('key'='doc_id')""".stripMargin)
      SpjBucket.buildBucketedLayout(embs, rootB, "doc_id", 8,
        statsCol = "doc_id")
      GraftCatalog.registerTable(tb, rootB)
      val view = s"spjd_src_$suf"
      docs.select("doc_id", "lang", "n_chars")
        .createOrReplaceTempView(view)
      spark.sql(s"INSERT INTO graft.$ta " +
        s"SELECT doc_id, lang, n_chars FROM $view")

      def joined(): DataFrame = spark.sql(
        s"""SELECT a.lang, b.label, count(*) AS n
           |FROM graft.$ta a JOIN graft.$tb b ON a.doc_id = b.doc_id
           |GROUP BY a.lang, b.label ORDER BY a.lang, b.label"""
          .stripMargin)
      def assertSpj(q: DataFrame, stage: String): Unit = {
        val plan = q.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val belowJoin = plan.substring(plan.indexOf("Join"))
        assert(!belowJoin.contains("Exchange hashpartitioning"),
          s"$stage lost the storage-partitioned join:\n$plan")
      }

      def expect(live: DataFrame) = live.join(embs, "doc_id")
        .groupBy("lang", "label").agg(count(lit(1)).as("n"))
        .orderBy("lang", "label").collect().map(_.toSeq)

      val q1 = joined()
      assert(q1.collect().map(_.toSeq) ===
        expect(docs.select("doc_id", "lang", "n_chars")))
      assertSpj(q1, "INSERT")

      spark.sql(s"DELETE FROM graft.$ta WHERE doc_id % 5 = 2")
      val live = docs.filter(col("doc_id") % 5 =!= 2)
        .select("doc_id", "lang", "n_chars")
      val q2 = joined()
      assert(q2.collect().map(_.toSeq) === expect(live))
      assertSpj(q2, "DELETE")

      spark.sql(s"CALL graft.system.compact(table => " +
        s"'${ta.stripPrefix("graft.")}', target_files => 4)")
      val q3 = joined()
      assert(q3.collect().map(_.toSeq) === expect(live))
      assertSpj(q3, "compact")

      // SQL MERGE INTO (the delta-based row-level op): post-image
      // and insert rows land bucketed too
      val mview = s"spjd_merge_$suf"
      live.filter(col("doc_id") % 7 === 1)
        .select(col("doc_id"), lit("mm").as("lang"))
        .createOrReplaceTempView(mview)
      spark.sql(
        s"""MERGE INTO graft.$ta t USING $mview m
           |ON t.doc_id = m.doc_id
           |WHEN MATCHED THEN UPDATE SET t.lang = m.lang"""
          .stripMargin)
      val live2 = live.withColumn("lang",
        when(col("doc_id") % 7 === 1, lit("mm")).otherwise(col("lang")))
      val q4 = joined()
      assert(q4.collect().map(_.toSeq) === expect(live2))
      assertSpj(q4, "MERGE INTO")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("one-side-shuffle SPJ: joining a bucketed chain to a PLAIN " +
    "relation shuffles only the plain side — Spark evaluates the " +
    "catalog's bucket() to route rows into the chain's layout, so " +
    "the V2 function's arithmetic is exercised by the engine itself") {
    ensureCatalog()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val root = Tables.matDir(s"spjs_${System.nanoTime}", spark,
        sf0001)
      SpjBucket.buildBucketedLayout(docs, root, "doc_id", 8)
      val t = s"spj.s_${System.nanoTime}"
      GraftCatalog.registerTable(t, root)
      val dimDir = Tables.matDir(s"spjs_dim_${System.nanoTime}", spark,
        sf0001)
      embs.write.mode("overwrite").parquet(dimDir)
      spark.read.parquet(dimDir).createOrReplaceTempView(s"spjs_dim")

      val q = spark.sql(
        s"""SELECT a.lang, count(*) AS n
           |FROM graft.$t a JOIN spjs_dim d ON a.doc_id = d.doc_id
           |GROUP BY a.lang ORDER BY a.lang""".stripMargin)
      val got = q.collect().map(r => (r.getString(0), r.getLong(1)))
      val expect = docs.join(embs, "doc_id").groupBy("lang")
        .agg(count(lit(1)).as("n")).orderBy("lang")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got === expect)

      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      if (plan.contains("MergeJoin")) {
        val below = plan.substring(plan.indexOf("MergeJoin"))
        // the chain side never shuffles; the plain side may carry ONE
        // exchange keyed by the v2 bucket function
        val chainSide = below.split("\\n").filter(_.contains(
          "graft-chain"))
        assert(chainSide.nonEmpty)
        val nExch = "Exchange hashpartitioning".r
          .findAllIn(below).length
        assert(nExch <= 1,
          s"expected at most the plain side's one shuffle:\n$plan")
      }
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.sources.v2.bucketing.shuffle.enabled")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("bucketing evolves onto an EXISTING table: ALTER TABLE SET " +
    "TBLPROPERTIES('bucket'='doc_id|8') is metadata-only, the next " +
    "compaction rewrites per bucket, and the SPJ join activates; " +
    "the bucket function is also SQL-callable through the catalog") {
    ensureCatalog()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val rootA = Tables.matDir(s"spje_a_${System.nanoTime}", spark,
        sf0001)
      val rootB = Tables.matDir(s"spje_b_${System.nanoTime}", spark,
        sf0001)
      ManifestPrune.buildLayout(docs, rootA, nFiles = 8) // UNbucketed
      SpjBucket.buildBucketedLayout(embs, rootB, "doc_id", 8,
        statsCol = "doc_id")
      val ta = s"spj.ea_${System.nanoTime}"
      val tb = s"spj.eb_${System.nanoTime}"
      GraftCatalog.registerTable(ta, rootA)
      GraftCatalog.registerTable(tb, rootB)

      spark.sql(s"ALTER TABLE graft.$ta SET TBLPROPERTIES " +
        "('bucket'='doc_id|8')")
      // declared but not yet physical: files carry no bucket ids, so
      // the join honestly shuffles
      def joined(): DataFrame = spark.sql(
        s"""SELECT a.lang, b.label, count(*) AS n
           |FROM graft.$ta a JOIN graft.$tb b ON a.doc_id = b.doc_id
           |GROUP BY a.lang, b.label ORDER BY a.lang, b.label"""
          .stripMargin)
      val expect = docs.join(embs, "doc_id").groupBy("lang", "label")
        .agg(count(lit(1)).as("n")).orderBy("lang", "label")
        .collect().map(_.toSeq)
      val q1 = joined()
      assert(q1.collect().map(_.toSeq) === expect)

      // compaction applies the declared bucketing physically
      ManifestPrune.compactCommit(spark, rootA, nFiles = 8)
      val q2 = joined()
      assert(q2.collect().map(_.toSeq) === expect)
      val plan = q2.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val below = plan.substring(plan.indexOf("Join"))
      assert(!below.contains("Exchange hashpartitioning"),
        s"evolved bucketing did not activate SPJ after compact:\n$plan")

      // the catalog-resolved bucket() is plain SQL too
      val b = spark.sql(
        s"SELECT graft.bucket(8, 12345L) AS b").collect().head.getInt(0)
      val direct = spark.range(12345L, 12346L)
        .select(SpjBucket.bucketCol("id", 8).as("b"))
        .collect().head.getInt(0)
      assert(b === direct)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("graft.db.t.partitions on a bucketed chain: one row per " +
    "bucket, per-bucket row sums match the bucket expression, and " +
    "time travel resolves the version's own groups") {
    ensureCatalog()
    val root = Tables.matDir(s"spjp_${System.nanoTime}", spark, sf0001)
    SpjBucket.buildBucketedLayout(docs, root, "doc_id", 8)
    val t = s"spj.p_${System.nanoTime}"
    GraftCatalog.registerTable(t, root)

    val got = spark.sql(s"SELECT bucket, n_rows, live_rows " +
      s"FROM graft.$t.partitions ORDER BY bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val expect = docs
      .groupBy(SpjBucket.bucketCol("doc_id", 8).as("bucket"))
      .agg(count(lit(1)).as("n")).orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(1)))
    assert(got === expect)

    // a DV delete shifts live_rows but not n_rows; VERSION AS OF 0
    // still serves the pre-delete groups
    ManifestPrune.dvDeleteWhereCommit(spark, root,
      col("doc_id") % 4 === 1)
    val after = spark.sql(s"SELECT sum(live_rows) AS l, " +
      s"sum(n_rows) AS p FROM graft.$t.partitions").collect().head
    assert(after.getLong(0) ===
      docs.filter(col("doc_id") % 4 =!= 1).count())
    assert(after.getLong(1) === docs.count())
    val asOf = spark.sql(s"SELECT sum(live_rows) AS l " +
      s"FROM graft.$t.partitions VERSION AS OF 0").collect().head
    assert(asOf.getLong(0) === docs.count())
  }

  test("the SPJ surface survives SQL INSERT: appends to a bucketed " +
    "chain stay bucketed (delta files carry their bucket ids) and " +
    "the join stays shuffle-free with the new rows visible") {
    ensureCatalog()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val rootA = Tables.matDir(s"spji_a_${System.nanoTime}", spark,
        sf0001)
      val rootB = Tables.matDir(s"spji_b_${System.nanoTime}", spark,
        sf0001)
      SpjBucket.buildBucketedLayout(docs, rootA, "doc_id", 8)
      SpjBucket.buildBucketedLayout(embs, rootB, "doc_id", 8,
        statsCol = "doc_id")
      val ta = s"spj.ia_${System.nanoTime}"
      val tb = s"spj.ib_${System.nanoTime}"
      GraftCatalog.registerTable(ta, rootA)
      GraftCatalog.registerTable(tb, rootB)
      // append through SQL: a doc that matches an existing embedding
      val probe = embs.orderBy("doc_id").limit(1)
        .collect().head.getLong(0)
      spark.sql(s"INSERT INTO graft.$ta VALUES " +
        s"($probe, 'spj appended row', 'zz', 'spj', 17)")

      val q = spark.sql(
        s"""SELECT a.lang, count(*) AS n
           |FROM graft.$ta a JOIN graft.$tb b ON a.doc_id = b.doc_id
           |GROUP BY a.lang ORDER BY a.lang""".stripMargin)
      val got = q.collect().map(r => (r.getString(0), r.getLong(1)))
      val zz = got.filter(_._1 == "zz")
      assert(zz === Array(("zz", 1L)), s"appended row missing: " +
        got.mkString(", "))

      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("MergeJoin") ||
        plan.contains("ShuffledHashJoin"))
      val belowJoin = plan.substring(plan.indexOf("Join"))
      assert(!belowJoin.contains("Exchange hashpartitioning"),
        s"append broke the storage-partitioned join:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }
}
