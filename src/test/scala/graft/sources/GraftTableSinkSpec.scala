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
  }
}
