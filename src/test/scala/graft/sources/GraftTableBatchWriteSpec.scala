package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The BATCH write face of the `graft-table` connector —
  * `df.write.format("graft-table")` on the public V1Write bridge:
  * append commits one version, upsert merges by key, delete is a
  * pure-metadata equality delete, SaveMode.Overwrite replaces — and
  * every committed state reads back through both the Scala API and
  * the format's own change-feed read. */
class GraftTableBatchWriteSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  private def fresh(tag: String): String = {
    val root = Tables.matDir(s"gtbw_${tag}_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    root
  }

  test("append / upsert / delete / overwrite round-trip through " +
    "df.write.format(graft-table)") {
    val root = fresh("rt")
    val n0 = docs.count()
    // append
    docs.limit(3)
      .withColumn("doc_id", col("doc_id") + 95000000L)
      .write.format("graft-table").mode("append").save(root)
    assert(ManifestPrune.currentVersion(spark, root) === 1L)
    assert(ManifestPrune.readCommitted(spark, root, 1L).count() === n0 + 3)
    // upsert: update one existing key, insert one new
    val up = docs.filter(col("doc_id") === 1L)
      .withColumn("lang", lit("bw"))
      .unionByName(docs.limit(1)
        .withColumn("doc_id", lit(96000001L))
        .withColumn("lang", lit("bw")))
    up.write.format("graft-table").option("mode", "upsert")
      .mode("append").save(root)
    val v2 = ManifestPrune.readCommitted(spark, root, 2L)
    assert(v2.filter(col("doc_id") === 1L).select("lang")
      .head().getString(0) === "bw")
    assert(v2.filter(col("doc_id") === 96000001L).count() === 1L)
    assert(v2.count() === n0 + 4)
    // delete: pure-metadata equality delete, no data file touched
    def dataFiles(): Set[String] =
      new java.io.File(root).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("data"))
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).toSet
    val before = dataFiles()
    docs.filter(col("doc_id") % 7 === 2).select("doc_id")
      .write.format("graft-table").option("mode", "delete")
      .mode("append").save(root)
    assert(dataFiles() === before)
    assert(ManifestPrune.readCommitted(spark, root, 3L)
      .filter(col("doc_id") % 7 === 2 && col("doc_id") < 95000000L)
      .count() === 0L)
    // SaveMode.Overwrite replaces the table contents
    docs.limit(5).write.format("graft-table")
      .mode("overwrite").save(root)
    val head = ManifestPrune.currentVersion(spark, root)
    assert(ManifestPrune.readCommitted(spark, root, head).count() === 5L)
    assert(ManifestPrune.commitNote(root, head) === Some("replace"))
    // pre-overwrite state stays travel-able
    assert(ManifestPrune.readCommitted(spark, root, 2L).count() === n0 + 4)
  }

  test("the batch write face rejects the streaming-only cdc mode " +
    "with a usable error") {
    val root = fresh("cdc")
    val e = intercept[Exception] {
      docs.limit(1).write.format("graft-table")
        .option("mode", "cdc").mode("append").save(root)
    }
    assert(e.getMessage.contains("streaming mode") ||
      Option(e.getCause).exists(_.getMessage.contains("streaming mode")))
  }
}
