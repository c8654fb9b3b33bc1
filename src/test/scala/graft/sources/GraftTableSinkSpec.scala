package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class SinkDocRow(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)

/** The graft-table STREAMING SINK driven by a real
  * `writeStream.format("graft-table")` query: one committed version
  * per micro-batch, exactly-once under replay, all three modes.
  * (Value correctness of the composed append→upsert→delete lifecycle
  * is the q_table_sink oracle gate.) */
class GraftTableSinkSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf0001, "documents")

  test("append mode: one version per micro-batch through a real " +
    "stream; a replayed batch id commits nothing") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    import spark.implicits._
    val root = Tables.matDir(s"sinkspec_app_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    val n0 = docs.count()
    val in = MemoryStream[SinkDocRow]
    val ckpt = s"${root}_ckpt"
    val q = in.toDF().writeStream.format("graft-table")
      .option("mode", "append")
      .option("checkpointLocation", ckpt)
      .start(root)
    try {
      in.addData(SinkDocRow(9000001L, "t1", "xx", "s0", 2L),
        SinkDocRow(9000002L, "t2", "xx", "s0", 2L))
      q.processAllAvailable()
      in.addData(SinkDocRow(9000003L, "t3", "yy", "s0", 2L))
      q.processAllAvailable()
    } finally q.stop()
    assert(ManifestPrune.currentVersion(spark, root) === 2L)
    val head = ManifestPrune.readCommitted(spark, root, 2L)
    assert(head.count() === n0 + 3)
    assert(head.filter(col("doc_id") >= 9000000L).count() === 3L)
    // a replayed batch id is a no-op on the tsink: cursor
    graft.streaming.StreamingPipelines.applySinkBatch(
      docs.limit(1), 1L, root, "append", "doc_id")
    assert(ManifestPrune.currentVersion(spark, root) === 2L)
  }

  test("table-to-table replication is ONE streaming query: " +
    "readStream the source feed, writeStream mode=cdc on the replica") {
    import org.apache.spark.sql.streaming.Trigger
    val src = Tables.matDir(s"sinkspec_cdc_src_${System.nanoTime}",
      spark, sf0001)
    val dst = Tables.matDir(s"sinkspec_cdc_dst_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, src, nFiles = 4)
    ManifestPrune.buildLayout(docs, dst, nFiles = 4)
    // source history: a multi-column CoW merge, a DV delete, an
    // equality delete, and a compaction (empty feed step)
    ManifestPrune.mergeIntoCommit(spark, src,
      docs.filter(col("doc_id") % 9 === 2)
        .select(col("doc_id"), lit("repl").as("lang")),
      docs.filter(col("doc_id") % 31 === 3)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    ManifestPrune.dvDeleteCommit(spark, src,
      docs.filter(col("doc_id") % 7 === 5).select("doc_id"))
    ManifestPrune.eqDeleteCommit(spark, src,
      docs.filter(col("doc_id") % 11 === 6).select("doc_id"))
    ManifestPrune.compactCommit(spark, src, nFiles = 3)
    val q = spark.readStream.format("graft-table")
      .option("maxVersionsPerTrigger", 2).load(src)
      .writeStream.format("graft-table")
      .option("mode", "cdc")
      .option("checkpointLocation", s"${dst}_ckpt")
      .trigger(Trigger.AvailableNow()).start(dst)
    q.awaitTermination(180000); q.stop()
    val want = ManifestPrune.readCommitted(spark, src,
      ManifestPrune.currentVersion(spark, src))
      .orderBy("doc_id").collect().map(_.toSeq)
    val got = ManifestPrune.readCommitted(spark, dst,
      ManifestPrune.currentVersion(spark, dst))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got === want, "replica diverged from the source head")
    // re-applying the same images is idempotent (the upsert applier)
    graft.streaming.StreamingPipelines.applySinkBatch(
      ManifestPrune.changeFeed(spark, src, 0L, 2L), 99L, dst, "cdc",
      "doc_id")
    val again = ManifestPrune.readCommitted(spark, dst,
      ManifestPrune.currentVersion(spark, dst))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(again === want, "replayed images changed the replica")
  }

  test("a restarted cdc replication query continues from its " +
    "checkpoint: no re-applied images, no missed versions") {
    import org.apache.spark.sql.streaming.Trigger
    val src = Tables.matDir(s"sinkspec_rst_src_${System.nanoTime}",
      spark, sf0001)
    val dst = Tables.matDir(s"sinkspec_rst_dst_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, src, nFiles = 4)
    ManifestPrune.buildLayout(docs, dst, nFiles = 4)
    val ckpt = s"${dst}_ckpt"
    def replicateOnce(): Unit = {
      val q = spark.readStream.format("graft-table").load(src)
        .writeStream.format("graft-table").option("mode", "cdc")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination(180000); q.stop()
    }
    ManifestPrune.dvDeleteCommit(spark, src,
      docs.filter(col("doc_id") % 5 === 1).select("doc_id"))
    replicateOnce() // drains v1, then the query terminates
    // source advances while the replication query is DOWN
    ManifestPrune.mergeIntoCommit(spark, src,
      docs.filter(col("doc_id") % 9 === 2 && col("doc_id") % 5 =!= 1)
        .select(col("doc_id"), lit("rst").as("lang")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    replicateOnce() // restart from the checkpoint: applies ONLY v2
    val want = ManifestPrune.readCommitted(spark, src, 2L)
      .orderBy("doc_id").collect().map(_.toSeq)
    val got = ManifestPrune.readCommitted(spark, dst,
      ManifestPrune.currentVersion(spark, dst))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got === want)
    // a third restart with nothing new applies nothing
    val before = ManifestPrune.currentVersion(spark, dst)
    replicateOnce()
    assert(ManifestPrune.currentVersion(spark, dst) === before,
      "an idle restart re-applied images")
  }

  test("upsert mode updates matched keys and inserts new ones; " +
    "delete mode is a pure-metadata commit") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    import spark.implicits._
    val root = Tables.matDir(s"sinkspec_up_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    val in = MemoryStream[SinkDocRow]
    val q = in.toDF().writeStream.format("graft-table")
      .option("mode", "upsert")
      .option("checkpointLocation", s"${root}_ckpt")
      .start(root)
    try {
      in.addData(SinkDocRow(1L, "nt", "up", "s0", 9L),
        SinkDocRow(9000001L, "new", "nn", "s0", 3L))
      q.processAllAvailable()
    } finally q.stop()
    val head = ManifestPrune.readCommitted(spark, root, 1L)
    assert(head.filter(col("doc_id") === 1L)
      .select("lang").head().getString(0) === "up")
    assert(head.filter(col("doc_id") === 9000001L).count() === 1L)
    assert(head.count() === docs.count() + 1)
    // delete mode: no data file written, keys hidden
    def dataFiles(): Set[String] =
      new java.io.File(root).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("data"))
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).toSet
    val before = dataFiles()
    // NB batch id continues the upsert stream's cursor (tsink: is a
    // per-TABLE cursor — the one-writer contract): id 0 would replay
    graft.streaming.StreamingPipelines.applySinkBatch(
      docs.filter(col("doc_id") % 7 === 1), 1L, root, "delete",
      "doc_id")
    assert(dataFiles() === before)
    val afterDel = ManifestPrune.readCommitted(spark, root, 2L)
    assert(afterDel.filter(col("doc_id") % 7 === 1 &&
      col("doc_id") < 9000000L).count() === 0L)
    // the sink's cursor note PRESERVES the eqdel kind token: history
    // still classifies the version as an eq-delete, and the tsink:
    // cursor still answers (a replay of the same id commits nothing)
    val note = ManifestPrune.commitNote(root, 2L).getOrElse("")
    assert(note.split("\\s+").contains("eqdel"), s"note was '$note'")
    val kind = ManifestPrune.describeHistory(spark, root)
      .filter(col("version") === 2L).select("kind").head().getString(0)
    assert(kind === "eq-delete",
      s"sink delete-mode version classified as '$kind'")
    graft.streaming.StreamingPipelines.applySinkBatch(
      docs.filter(col("doc_id") % 7 === 1), 1L, root, "delete",
      "doc_id")
    assert(ManifestPrune.currentVersion(spark, root) === 2L,
      "a replayed delete-mode batch id committed a version")
  }

  test("a cdc batch replayed after a mid-batch crash skips the " +
    "versions its cdcv cursor already applied") {
    val src = Tables.matDir(s"sinkspec_mid_src_${System.nanoTime}",
      spark, sf0001)
    val dst = Tables.matDir(s"sinkspec_mid_dst_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, src, nFiles = 4)
    ManifestPrune.buildLayout(docs, dst, nFiles = 4)
    ManifestPrune.mergeIntoCommit(spark, src,
      docs.filter(col("doc_id") % 9 === 2)
        .select(col("doc_id"), lit("mid").as("lang")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    ManifestPrune.dvDeleteCommit(spark, src,
      docs.filter(col("doc_id") % 7 === 5).select("doc_id"))
    ManifestPrune.mergeIntoCommit(spark, src,
      docs.filter(col("doc_id") % 9 === 4 && col("doc_id") % 7 =!= 5)
        .select(col("doc_id"), lit("mid2").as("lang")),
      docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    // "crash" after the batch's first two source versions applied:
    // the same micro-batch id then REPLAYS carrying all three
    graft.streaming.StreamingPipelines.applySinkBatch(
      ManifestPrune.changeFeed(spark, src, 0L, 2L), 0L, dst, "cdc",
      "doc_id")
    val partial = ManifestPrune.currentVersion(spark, dst)
    graft.streaming.StreamingPipelines.applySinkBatch(
      ManifestPrune.changeFeed(spark, src, 0L, 3L), 0L, dst, "cdc",
      "doc_id")
    val want = ManifestPrune.readCommitted(spark, src, 3L)
      .orderBy("doc_id").collect().map(_.toSeq)
    val got = ManifestPrune.readCommitted(spark, dst,
      ManifestPrune.currentVersion(spark, dst))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got === want, "mid-batch replay diverged the replica")
    // only v3's images landed on the replay — v1/v2 were skipped by
    // the cdcv cursor, not re-applied
    assert(ManifestPrune.currentVersion(spark, dst) <= partial + 2,
      "the replayed batch re-applied already-cursored versions")
  }
}
