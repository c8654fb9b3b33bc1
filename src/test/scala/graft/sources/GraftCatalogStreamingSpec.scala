package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Catalog-resolved streaming: `spark.readStream.table("graft.db.t")`
  * is the Delta-style ROW stream (snapshot batch + per-append added
  * files, change commits fail unless skipChangeCommits),
  * `readStream.table("graft.db.t.changes")` tails the change feed,
  * and `writeStream.toTable("graft.db.t")` commits through the same
  * exactly-once staged sink as the `graft-table` format — no paths or
  * format strings anywhere in the user's code. */
class GraftCatalogStreamingSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)

  /** base layout + one DV delete: a masked snapshot. */
  private def maskedChain(tag: String): String = {
    val root = Tables.matDir(s"catstream_${tag}_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    root
  }

  private def registered(tag: String, root: String): String = {
    ensureCatalog()
    val tbl = s"cs.${tag}_${System.nanoTime}"
    GraftCatalog.registerTable(tbl, root)
    tbl
  }

  private def runToParquet(tbl: String, ck: String, dest: String,
                           opts: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream
    opts.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.table(s"graft.$tbl")
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          b.toDF().write.mode("append").parquet(dest)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000); q.stop()
  }

  test("readStream.table: the first batch is the MASKED snapshot " +
    "(equal to batch SELECT), appends after the checkpoint stream " +
    "as exactly the added rows, one version per batch under " +
    "maxVersionsPerTrigger=1") {
    val root = maskedChain("read")
    val tbl = registered("read", root)
    val out = Tables.matDir(s"catstream_out_${System.nanoTime}",
      spark, sf0001)
    runToParquet(tbl, s"$out/_ck", s"$out/rows",
      Map("maxVersionsPerTrigger" -> "1"))
    val batchRead = spark.sql(
      s"SELECT doc_id, lang FROM graft.$tbl").orderBy("doc_id")
      .collect().map(_.toSeq)
    assert(spark.read.parquet(s"$out/rows").select("doc_id", "lang")
      .orderBy("doc_id").collect().map(_.toSeq) === batchRead)

    // two appends; resume from the checkpoint → ONLY the new rows
    ManifestPrune.appendCommit(spark, root,
      docs.limit(2).select((col("doc_id") + 50000000L).as("doc_id"),
        col("text"), lit("ap").as("lang"), col("source"),
        col("n_chars")))
    ManifestPrune.appendCommit(spark, root,
      docs.limit(1).select((col("doc_id") + 60000000L).as("doc_id"),
        col("text"), lit("ap").as("lang"), col("source"),
        col("n_chars")))
    runToParquet(tbl, s"$out/_ck", s"$out/rows2",
      Map("maxVersionsPerTrigger" -> "1"))
    val appended = spark.read.parquet(s"$out/rows2")
    assert(appended.count() === 3L)
    assert(appended.select("lang").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("ap"))
  }

  test("readStream.table fails on a non-append commit with a clear " +
    "error; skipChangeCommits drops it; startingVersion skips the " +
    "snapshot") {
    val root = maskedChain("chg")
    val tbl = registered("chg", root)
    val out = Tables.matDir(s"catstream_out_${System.nanoTime}",
      spark, sf0001)
    runToParquet(tbl, s"$out/_ck", s"$out/rows")
    // a DV delete after the snapshot: not representable as rows
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 11 === 5).select("doc_id"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.table(s"graft.$tbl")
        .writeStream.option("checkpointLocation", s"$out/_ck")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           _: Long) => b.toDF().count(); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .exists(t => Option(t.getMessage)
        .exists(_.contains("not a pure append"))))
    // skipChangeCommits: the delete commit is dropped, the stream
    // advances past it, and a later append still comes through
    ManifestPrune.appendCommit(spark, root,
      docs.limit(1).select((col("doc_id") + 70000000L).as("doc_id"),
        col("text"), lit("sk").as("lang"), col("source"),
        col("n_chars")))
    runToParquet(tbl, s"$out/_ck", s"$out/rows3",
      Map("skipChangeCommits" -> "true"))
    val got = spark.read.parquet(s"$out/rows3")
    assert(got.count() === 1L)
    assert(got.select("lang").head().getString(0) === "sk")

    // startingVersion: changes-only, no snapshot batch
    runToParquet(tbl, s"$out/_ck4", s"$out/rows4",
      Map("startingVersion" -> "3", "skipChangeCommits" -> "true"))
    assert(spark.read.parquet(s"$out/rows4").count() === 1L)
  }

  test("graft.db.t.changes: batch SELECT reads the whole feed window " +
    "and readStream.table tails it — both equal the changeFeed " +
    "computation") {
    val root = maskedChain("feed")
    val tbl = registered("feed", root)
    val direct = ManifestPrune.changeFeed(spark, root, 0L, 1L)
      .select("op", "doc_id", "version")
      .orderBy("version", "op", "doc_id").collect().map(_.toSeq)
    assert(spark.sql(
      s"SELECT op, doc_id, version FROM graft.$tbl.changes " +
        "ORDER BY version, op, doc_id").collect().map(_.toSeq) === direct)
    val out = Tables.matDir(s"catstream_out_${System.nanoTime}",
      spark, sf0001)
    val q = spark.readStream.table(s"graft.$tbl.changes")
      .writeStream.option("checkpointLocation", s"$out/_ck")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          b.toDF().write.mode("append").parquet(s"$out/rows")
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000); q.stop()
    assert(spark.read.parquet(s"$out/rows")
      .select("op", "doc_id", "version")
      .orderBy("version", "op", "doc_id").collect().map(_.toSeq)
      === direct)
  }

  test("writeStream.toTable commits through the exactly-once staged " +
    "sink: append epochs land as versions, a replayed epoch commits " +
    "nothing (the per-table tsink cursor), upsert mode merges on the " +
    "registered key") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val root = Tables.matDir(s"catstream_sink_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(
      docs.orderBy("doc_id").limit(4)
        .select(col("doc_id"), col("lang"), col("n_chars")),
      root, nFiles = 1)
    val tbl = registered("sink", root)
    val out = Tables.matDir(s"catstream_out_${System.nanoTime}",
      spark, sf0001)

    val in = MemoryStream[(Long, String, Long)]
    in.addData((90000001L, "aa", 5L), (90000002L, "bb", 5L))
    val q = in.toDF().toDF("doc_id", "lang", "n_chars")
      .writeStream.option("checkpointLocation", s"$out/_ck")
      .trigger(Trigger.AvailableNow())
      .toTable(s"graft.$tbl")
    q.awaitTermination(120000); q.stop()
    assert(spark.sql(s"SELECT count(*) FROM graft.$tbl " +
      "WHERE doc_id >= 90000000").collect().head.getLong(0) === 2L)

    // a replayed epoch 0 (fresh checkpoint, same table) is refused by
    // the per-table tsink cursor — the one-stream-per-table contract:
    // no duplicate rows, no new version
    val vBefore = ManifestPrune.currentVersion(spark, root)
    val in2 = MemoryStream[(Long, String, Long)]
    in2.addData((90000001L, "aa", 5L), (90000002L, "bb", 5L))
    val q2 = in2.toDF().toDF("doc_id", "lang", "n_chars")
      .writeStream.option("checkpointLocation", s"$out/_ck2")
      .trigger(Trigger.AvailableNow())
      .toTable(s"graft.$tbl")
    q2.awaitTermination(120000); q2.stop()
    assert(spark.sql(s"SELECT count(*) FROM graft.$tbl " +
      "WHERE doc_id >= 90000000").collect().head.getLong(0) === 2L)
    assert(ManifestPrune.currentVersion(spark, root) === vBefore)

    // the ORIGINAL query's next epoch (same checkpoint, new data)
    // advances the cursor and lands
    in.addData((90000003L, "cc", 5L))
    val q1b = in.toDF().toDF("doc_id", "lang", "n_chars")
      .writeStream.option("checkpointLocation", s"$out/_ck")
      .trigger(Trigger.AvailableNow())
      .toTable(s"graft.$tbl")
    q1b.awaitTermination(120000); q1b.stop()
    assert(spark.sql(s"SELECT count(*) FROM graft.$tbl " +
      "WHERE doc_id >= 90000000").collect().head.getLong(0) === 3L)

    // upsert mode on its own table: matched key takes the post-image
    val root2 = Tables.matDir(s"catstream_up_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(
      docs.orderBy("doc_id").limit(4)
        .select(col("doc_id"), col("lang"), col("n_chars")),
      root2, nFiles = 1)
    val tbl2 = registered("up", root2)
    val firstId = docs.orderBy("doc_id").head().getLong(0)
    val in3 = MemoryStream[(Long, String, Long)]
    in3.addData((firstId, "zz", 5L), (90000009L, "zz", 5L))
    val q3 = in3.toDF().toDF("doc_id", "lang", "n_chars")
      .writeStream.option("checkpointLocation", s"$out/_ck3")
      .option("mode", "upsert")
      .trigger(Trigger.AvailableNow())
      .toTable(s"graft.$tbl2")
    q3.awaitTermination(120000); q3.stop()
    assert(spark.sql(s"SELECT count(*) FROM graft.$tbl2")
      .collect().head.getLong(0) === 5L)
    assert(spark.sql(s"SELECT lang FROM graft.$tbl2 " +
      s"WHERE doc_id = $firstId").collect().map(_.getString(0)).toSeq
      === Seq("zz"))
  }
}
