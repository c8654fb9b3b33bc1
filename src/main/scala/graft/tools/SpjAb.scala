package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the storage-partitioned join against the plain shuffled join
  * at one scale: two chains co-bucketed on doc_id vs the same data
  * joined from parquet, broadcast disabled so BOTH sides pay the join
  * honestly. Prints one JSON line with medians of `passes` runs.
  *
  * Usage: `runMain graft.tools.SpjAb [sfDir] [nBuckets]`. */
object SpjAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBuckets = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkTune.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val docs = graft.Tables.load(spark, sfDir, "documents")
    val embs = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("label"))
    val rootA = graft.Tables.matDir(s"spjab_a_${System.nanoTime}",
      spark, sfDir)
    val rootB = graft.Tables.matDir(s"spjab_b_${System.nanoTime}",
      spark, sfDir)
    graft.sources.SpjBucket.buildBucketedLayout(docs, rootA, "doc_id",
      nBuckets)
    graft.sources.SpjBucket.buildBucketedLayout(embs, rootB, "doc_id",
      nBuckets, statsCol = "doc_id")
    graft.sources.GraftCatalog.registerTable("ab.docs", rootA)
    graft.sources.GraftCatalog.registerTable("ab.embs", rootB)
    // the plain side reads the SAME bucketed files by path, so file
    // count/layout match and only the join strategy differs
    docs.createOrReplaceTempView("ab_docs_plain")
    embs.createOrReplaceTempView("ab_embs_plain")

    // shuffle bytes are the A/B's real subject: wall-clock at local
    // toy scale under-prices an exchange (loopback, no spill); the
    // bytes a 1000-executor cluster would move are what SPJ deletes
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler
              .SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def time(q: String): (Double, Long, String) = {
      spark.sql(q).collect() // warm (I/O cache, codegen)
      Thread.sleep(500) // listener bus drain (async delivery)
      shuffleBytes.set(0L)
      var lastPlan = ""
      // a FRESH DataFrame per run: re-collecting one df reuses its
      // materialized AQE shuffle stages and would hide the exchange
      val runs = (1 to 5).map { _ =>
        val df = spark.sql(q)
        val t0 = System.nanoTime()
        df.collect()
        val dt = (System.nanoTime() - t0) / 1e9
        lastPlan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        dt
      }.sorted
      Thread.sleep(500) // listener bus drain
      (runs(runs.length / 2), shuffleBytes.get() / 5, lastPlan)
    }
    val sel = """SELECT a.lang, b.label, count(*) AS n,
                | sum(a.n_chars) AS sum_chars""".stripMargin
    // a key-grouped join needs no exchange on either side; preferring
    // the hash join also skips the per-group sorts SMJ would add
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    val (tSpj, bSpj, planSpj) = time(
      s"""$sel FROM graft.ab.docs a JOIN graft.ab.embs b
         |ON a.doc_id = b.doc_id
         |GROUP BY a.lang, b.label""".stripMargin)
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    val (tPlain, bPlain, _) = time(
      s"""$sel FROM ab_docs_plain a JOIN ab_embs_plain b
         |ON a.doc_id = b.doc_id
         |GROUP BY a.lang, b.label""".stripMargin)
    val joinIdx = planSpj.indexOf("Join")
    val spjShuffleFree = joinIdx >= 0 &&
      !planSpj.substring(joinIdx).contains("Exchange hashpartitioning")
    println(s"""{"metric":"spj_ab","sf":"$sfDir",""" +
      s""""buckets":$nBuckets,"spj_sec":$tSpj,""" +
      s""""plain_sec":$tPlain,"spj_shuffle_bytes":$bSpj,""" +
      s""""plain_shuffle_bytes":$bPlain,""" +
      s""""spj_shuffle_free":$spjShuffleFree}""")
    spark.stop()
  }
}
