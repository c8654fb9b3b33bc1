package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The `graft-table` DSv2 change-feed source: batch face ≡ the
  * changeFeed computation, stream face ≡ batch face (same rows
  * through the micro-batch path), admission control bounds versions
  * per batch, restart resumes from the checkpoint without replay,
  * and the two production consumers driven THROUGH the stream —
  * replication and incremental MV maintenance — land on the same
  * state the batch appliers produce. */
class GraftTableSourceSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  /** fresh chain: CoW upsert v1, DV delete v2, compaction v3 (the
    * ChangeFeedSpec chain, one commit of each kind). */
  private def chain(tag: String): String = {
    val root = graft.Tables.matDir(s"gts_${tag}_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    ManifestPrune.cowMergeCommit(spark, root,
      docs.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"), lit("zz").as("new_lang")),
      docs.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 20000000L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    ManifestPrune.compactCommit(spark, root, nFiles = 2)
    root
  }

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .orderBy("version", "op", "doc_id").collect().map(_.toSeq)

  test("batch read equals the changeFeed computation, and honors the " +
    "version window options") {
    val root = chain("batch")
    val viaSource = spark.read.format("graft-table").load(root)
    val direct = ManifestPrune.changeFeed(spark, root, 0L, 3L)
    assert(viaSource.schema.fieldNames.toSeq ===
      direct.schema.fieldNames.toSeq)
    assert(canon(viaSource) === canon(direct))
    val windowed = spark.read.format("graft-table")
      .option("fromVersion", 1).option("toVersion", 2).load(root)
    assert(canon(windowed) ===
      canon(ManifestPrune.changeFeed(spark, root, 1L, 2L)))
  }

  test("stream face emits the same rows as the batch face, one " +
    "version per micro-batch under maxVersionsPerTrigger=1") {
    val root = chain("stream")
    val out = graft.Tables.matDir(s"gts_sink_${System.nanoTime}",
      spark, sf0001)
    val ck = s"$out/_ck"
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = spark.readStream.format("graft-table")
      .option("maxVersionsPerTrigger", 1).load(root)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val df = b.toDF().localCheckpoint()
        batches.add((id, df.select("version").distinct().count()))
        df.write.mode("append").parquet(s"$out/rows")
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000); q.stop()
    // every non-empty micro-batch carried exactly one version
    import scala.jdk.CollectionConverters._
    assert(batches.asScala.forall(_._2 <= 1))
    assert(canon(spark.read.parquet(s"$out/rows")) ===
      canon(ManifestPrune.changeFeed(spark, root, 0L, 3L)))
    // restart from the checkpoint: nothing new to consume, no replay
    val q2 = spark.readStream.format("graft-table")
      .option("maxVersionsPerTrigger", 1).load(root)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.toDF().write.mode("append").parquet(s"$out/rows")
      }
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000); q2.stop()
    assert(canon(spark.read.parquet(s"$out/rows")) ===
      canon(ManifestPrune.changeFeed(spark, root, 0L, 3L)))
    // a NEW commit after restart is picked up where the cursor left off
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 19 === 6).select("doc_id"))
    val q3 = spark.readStream.format("graft-table")
      .load(root)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.toDF().write.mode("append").parquet(s"$out/rows")
      }
      .trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination(120000); q3.stop()
    assert(canon(spark.read.parquet(s"$out/rows")) ===
      canon(ManifestPrune.changeFeed(spark, root, 0L, 4L)))
  }

  test("replicateStream converges the replica to the source head " +
    "through the streaming face") {
    val root = chain("repl")
    val dst = graft.Tables.matDir(s"gts_repl_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, dst, nFiles = 4)
    val ck = graft.Tables.matDir(s"gts_replck_${System.nanoTime}",
      spark, sf0001)
    val q = graft.streaming.StreamingPipelines
      .replicateStream(spark, root, dst)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000); q.stop()
    val rep = ManifestPrune.readCommitted(spark, dst,
      ManifestPrune.currentVersion(spark, dst))
      .orderBy("doc_id").collect().map(_.toSeq)
    val head = ManifestPrune.readCommitted(spark, root, 3L)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(rep === head)
  }

  test("seed + maintainLangMvFromFeed lands the MV on the head " +
    "aggregate without any base-table rescan") {
    val root = chain("mv")
    val mvDir = graft.Tables.matDir(s"gts_mv_${System.nanoTime}",
      spark, sf0001)
    val ck = graft.Tables.matDir(s"gts_mvck_${System.nanoTime}",
      spark, sf0001)
    graft.streaming.StreamingPipelines.seedLangMv(spark, root, mvDir)
    val q = graft.streaming.StreamingPipelines
      .maintainLangMvFromFeed(spark, root, mvDir)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000); q.stop()
    val mv = graft.streaming.StreamingPipelines.currentMv(spark, mvDir)
      .orderBy("lang").collect().map(_.toSeq)
    val expect = ManifestPrune.readCommitted(spark, root, 3L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang").collect().map(_.toSeq)
    assert(mv === expect)
  }

  test("the feed spill is keyed by the merge key: readers diffing on " +
    "different keys never adopt each other's spills") {
    // a table with TWO unique key columns (doc_id and k2) whose
    // pairings disagree on a delete+insert commit: the new row reuses
    // a deleted row's k2, so by doc_id the feed says delete+insert
    // while by k2 it says update — a reader served the wrong key's
    // spill would emit wrongly-paired ops
    val root = graft.Tables.matDir(s"gts_key_${System.nanoTime}",
      spark, sf0001)
    val base = docs.limit(50)
      .withColumn("k2", -col("doc_id"))
    ManifestPrune.buildLayout(base, root, nFiles = 2)
    val victim = base.orderBy("doc_id").select("doc_id", "k2")
      .head()
    val vId = victim.getLong(0)
    val vK2 = victim.getLong(1)
    val cols = base.columns.toSeq
    val insert = base.filter(col("doc_id") === vId)
      .withColumn("doc_id", lit(77000001L))
      .withColumn("text", lit("reborn"))
      .select(cols.map(col): _*)
    ManifestPrune.mergeIntoCommit(spark, root,
      insert.limit(0).select(col("doc_id"), col("lang")), insert,
      deletes = Some(insert.limit(0).select("doc_id")
        .unionByName(base.filter(col("doc_id") === vId)
          .select("doc_id"))))
    def ops(key: String): Map[String, Long] =
      spark.read.format("graft-table").option("key", key).load(root)
        .groupBy("op").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byId = ops("doc_id")
    assert(byId.getOrElse("delete", 0L) === 1L)
    assert(byId.getOrElse("insert", 0L) === 1L)
    assert(byId.getOrElse("update_preimage", 0L) === 0L)
    val byK2 = ops("k2")
    assert(byK2.getOrElse("update_preimage", 0L) === 1L,
      s"k2-keyed feed adopted the doc_id spill: $byK2")
    assert(byK2.getOrElse("update_postimage", 0L) === 1L)
    assert(byK2.getOrElse("delete", 0L) === 0L)
    // and the spills live under per-key paths
    assert(new java.io.File(s"$root/_cdc/doc_id/v1/_FEED_READY").isFile)
    assert(new java.io.File(s"$root/_cdc/k2/v1/_FEED_READY").isFile)
    // wrong k2 reads the victim's pre-image (vK2 pairing held)
    val pre = spark.read.format("graft-table").option("key", "k2")
      .load(root).filter(col("op") === "update_preimage")
      .select("doc_id", "k2").head()
    assert(pre.getLong(0) === vId && pre.getLong(1) === vK2)
  }
}
