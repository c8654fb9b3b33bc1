package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Library showcase entry: exercises the north-star surfaces end-to-end
  * on a testdata dir — streaming sessionization, multimodal decode
  * pipeline, and the native cosine expression. Usage:
  *   spark-submit --class graft.Demo <jar> <sfDir>
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.SparkTune.tuned(SparkSession.builder())
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 1. streaming: file-source events -> watermarked tumbling windows
    import org.apache.spark.sql.streaming.Trigger
    val win = streaming.StreamingPipelines.windowedCounts(
      streaming.StreamingPipelines.readEventsStream(spark, sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value"))
    val q = win.writeStream.format("memory").queryName("demo_win")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000); q.stop()
    println(s"[demo] streaming windows: ${spark.table("demo_win").count()}")

    // 1b. streaming heavy hitters: k-bounded Misra-Gries state per
    // window over the event-type token stream
    val hh = streaming.StreamingPipelines.windowedHeavyHitters(
      streaming.StreamingPipelines.readEventsStream(spark, sfDir)
        .select(col("ts"), col("event_type").as("tok")), k = 4)
    val qh = hh.writeStream.format("memory").queryName("demo_hh")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    qh.awaitTermination(120000); qh.stop()
    val hhTop = spark.table("demo_hh")
      .select(explode(col("sketch")).as("e"))
      .groupBy(col("e.token").as("tok")).count()
      .orderBy(desc("count")).limit(1).collect()
    println(s"[demo] streaming heavy hitters: " +
      s"${spark.table("demo_hh").count()} windows, most-frequent " +
      s"candidate '${if (hhTop.nonEmpty) hhTop(0).getString(0) else "-"}'")

    // 2. multimodal: documents -> binary payloads -> features
    val feats = multimodal.MultimodalPipeline.run(spark, sfDir)
    println(s"[demo] multimodal features: ${feats.count()}")

    // 3. native cosine expression via SQL registration
    functions.CosineSimilarity.register(spark)
    Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("emb")
    val top = spark.sql(
      """SELECT a.vec_id a_id, b.vec_id b_id,
        |  cosine_sim(a.embedding, b.embedding) AS cos
        |FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |ORDER BY cos DESC LIMIT 3""".stripMargin).collect()
    top.foreach(r => println(
      f"[demo] top-cos pair: ${r.getLong(0)}%d-${r.getLong(1)}%d = ${r.getDouble(2)}%.4f"))

    // 4. IVF ANN: train centroids, probe 2 of 8 lists per query
    val emb = Tables.load(spark, sfDir, "embeddings")
    val centroids = similarity.IvfIndex.train(emb, k = 8, iters = 2)
    val assignments = similarity.IvfIndex.assign(emb, centroids)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val hits = similarity.IvfIndex.search(
      emb, assignments, centroids, queries, topK = 5, nProbe = 2)
    println(s"[demo] ivf hits: ${hits.count()} (3 queries x top-5, 2/8 lists probed)")

    // 5. as-of join: latest click at-or-before each purchase (one
    // shuffle, no range join)
    val asof = SparkEntry.queries("q_asof_join")(spark, sfDir)
    println(s"[demo] asof-joined purchases: ${asof.count()} " +
      s"(${asof.filter(col("asof_click_id").isNotNull).count()} with a prior click)")

    // 6. decontamination: broadcast 3-gram screen vs the held-out set
    val decon = SparkEntry.queries("q_decontaminate")(spark, sfDir)
    println(s"[demo] contaminated docs: ${decon.count()}")

    // 7. stream-stream attribution join over the same events (batch
    // mode of the identical expression)
    val attr = streaming.StreamingPipelines.clickAttribution(
      Tables.load(spark, sfDir, "events"))
    println(s"[demo] click-attribution pairs: ${attr.count()}")

    // 8. graft-tsv V2 connector: atomic staged write, read back with
    // an inferred all-string schema
    val tsvOut = java.nio.file.Files
      .createTempDirectory("demo_tsv_").toString
    asof.limit(50).write.format("graft-tsv").mode("overwrite").save(tsvOut)
    val tsvBack = spark.read.format("graft-tsv").load(tsvOut).count()
    println(s"[demo] graft-tsv round-trip: $tsvBack rows, _SUCCESS=" +
      new java.io.File(s"$tsvOut/_SUCCESS").exists())

    // 9. table layer: merge-on-read DELETE (deletion vectors, no data
    // file rewritten) then compaction materializing the vectors — the
    // committed chain end-to-end
    val docs = Tables.load(spark, sfDir, "documents")
    val root = java.nio.file.Files
      .createTempDirectory("demo_table_").toString
    import graft.sources.ManifestPrune
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    val v1 = ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 10 === 0).select("doc_id"))
    val live = ManifestPrune.liveRowCount(spark,
      ManifestPrune.manifestOf(root, v1), ManifestPrune.dvOf(root, v1))
    val v2 = ManifestPrune.compactCommit(spark, root, nFiles = 2)
    println(s"[demo] table chain: ${docs.count()} rows -> dv-delete v$v1 " +
      s"(live=$live, zero files rewritten) -> compact v$v2 " +
      s"(${ManifestPrune.readCommitted(spark, root, v2).count()} rows, " +
      "vectors materialized)")

    // 10. write-audit-publish on a BRANCH: fork main, merge on the
    // branch in isolation, rebase over a concurrent main commit,
    // fast-forward-publish both sides' changes as one version
    ManifestPrune.createBranch(spark, root, "wap", v2)
    val br = ManifestPrune.branchRoot(root, "wap")
    ManifestPrune.mergeIntoCommit(spark, br,
      docs.filter(col("doc_id") % 7 === 1)
        .select(col("doc_id"), lit("wap").as("lang")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    ManifestPrune.dvDeleteCommit(spark, root,         // main diverges
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    ManifestPrune.rebaseBranch(spark, root, "wap")
    val vPub = ManifestPrune.fastForward(spark, root, "wap")
    val pub = ManifestPrune.readCommitted(spark, root, vPub)
    println(s"[demo] branch WAP: merge on 'wap' + diverged main -> " +
      s"rebase -> fast-forward v$vPub " +
      s"(${pub.count()} rows, ${pub.filter(col("lang") === "wap").count()} " +
      "merged, both sides' changes published)")

    // 11. equality delete (pure-metadata commit), shallow clone with
    // vacuum protection, and a point lookup through the bloom index
    val vEq = ManifestPrune.eqDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 13 === 4).select("doc_id"))
    val clone = s"${root}_clone"
    ManifestPrune.cloneTable(spark, root, clone)
    graft.sources.BloomIndex.build(spark, root, vEq)
    val pt = graft.sources.BloomIndex.readPoint(spark, root, vEq,
      "doc_id", Seq(3L, 7L, 11L))
    println(s"[demo] eq-delete v$vEq (zero scans) -> shallow clone " +
      s"(${ManifestPrune.readCommitted(spark, clone, 0L).count()} rows, " +
      s"0 data files copied) -> bloom point lookup: ${pt.count()} rows " +
      s"from ${graft.sources.BloomIndex.planFiles(spark, root, vEq,
        Seq(3L, 7L, 11L)).size} file(s)")

    // 12. replication as ONE streaming query: readStream the change
    // feed, writeStream mode=cdc onto a replica chain
    val replica = java.nio.file.Files
      .createTempDirectory("demo_replica_").toString
    ManifestPrune.buildLayout(docs, replica, nFiles = 4)
    val rq = spark.readStream.format("graft-table").load(root)
      .writeStream.format("graft-table").option("mode", "cdc")
      .option("checkpointLocation", s"${replica}_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(replica)
    rq.awaitTermination(120000); rq.stop()
    val srcN = ManifestPrune.readCommitted(spark, root,
      ManifestPrune.currentVersion(spark, root)).count()
    val repN = ManifestPrune.readCommitted(spark, replica,
      ManifestPrune.currentVersion(spark, replica)).count()
    println(s"[demo] streaming replication: source $srcN rows -> " +
      s"replica $repN rows (one readStream->writeStream query, " +
      s"converged=${srcN == repN})")

    spark.stop()
  }
}
