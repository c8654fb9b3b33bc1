package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The snapshot metadata cache (ManifestPrune.dirFact /
  * immutableParquet) must be SELF-VALIDATING: facts served for a
  * directory are keyed to its child listing, so an overwrite (which
  * always mints fresh part-file names) invalidates every cached fact
  * without any write-site cooperation — stale schemas, file lists, or
  * counts can never be served for changed bytes. */
class SnapshotCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"snapcache_$name").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/$name"
  }

  test("immutableParquet serves the cached schema while the dir is " +
      "unchanged and re-infers after an overwrite") {
    import spark.implicits._
    val dir = tmp("sch")
    Seq((1L, "a")).toDF("id", "s").write.parquet(dir)
    val first = ManifestPrune.immutableParquet(spark, dir).schema
    assert(first.fieldNames.toSeq == Seq("id", "s"))
    // warm read: same schema, and the data itself is re-read (not
    // memoized) — append via overwrite with an extra column
    Seq((2L, "b", 9L)).toDF("id", "s", "extra")
      .write.mode("overwrite").parquet(dir)
    val second = ManifestPrune.immutableParquet(spark, dir)
    assert(second.schema.fieldNames.toSeq == Seq("id", "s", "extra"))
    assert(second.count() == 1L)
    assert(second.select("extra").head.getLong(0) == 9L)
  }

  test("dvHiddenCount invalidates with the directory listing") {
    import spark.implicits._
    val dir = tmp("dv")
    Seq(("f1", 0L), ("f1", 1L)).toDF("file", "pos").write.parquet(dir)
    assert(ManifestPrune.dvHiddenCount(spark, dir) == 2L)
    // cached on the second ask
    assert(ManifestPrune.dvHiddenCount(spark, dir) == 2L)
    Seq(("f1", 0L), ("f1", 1L), ("f2", 0L)).toDF("file", "pos")
      .write.mode("overwrite").parquet(dir)
    assert(ManifestPrune.dvHiddenCount(spark, dir) == 3L)
  }

  test("readVersion's cached file list tracks a republished manifest") {
    import spark.implicits._
    val root = tmp("chain")
    val docs = (1L to 40L)
      .map(i => (i, s"text $i", "xx", "src0", 10L + i % 7))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    val mf = ManifestPrune.manifestOf(root, 0L)
    val v0 = ManifestPrune.readVersion(spark, mf)
    assert(v0.count() == 40L)
    // warm: identical result, file list now served from the cache
    assert(ManifestPrune.readVersion(spark, mf).count() == 40L)
    // a DV-delete commit publishes a NEW manifest dir; the old one is
    // untouched and its cached facts stay valid
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter($"doc_id" % 2 === 0).select("doc_id"))
    val v1 = ManifestPrune.readCommitted(spark, root, 1L)
    assert(v1.count() == 20L)
    assert(ManifestPrune.readVersion(spark, mf).count() == 40L)
  }
}
