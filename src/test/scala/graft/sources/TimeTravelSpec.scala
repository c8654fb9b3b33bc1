package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Time-travel resolution over the version chain
  * (ManifestPrune.versionAsOf/readAsOf): as-of resolves through the
  * retained commit markers' mtimes to the HIGHEST version committed
  * at-or-before T, boundary cases FAIL with clear errors (before
  * creation; expired by vacuum) instead of returning a wrong
  * snapshot, and the resolved reads are row-exact against the chain's
  * own arithmetic. q_time_travel hash-gates the read values; this
  * pins the resolution contract. */
class TimeTravelSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  private def chain(): (String, Long, Long) = {
    val root = graft.Tables.matDir(s"travel_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    val v1 = ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 19 === 7).select("doc_id"))
    Thread.sleep(15)
    val v2 = ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 23 === 5).select("doc_id"))
    (root, ManifestPrune.commitTimeMs(root, v1).get,
      ManifestPrune.commitTimeMs(root, v2).get)
  }

  test("as-of resolves the exact commit instant, between-instants, " +
    "and the far future to the right versions") {
    val (root, t1, t2) = chain()
    assert(t1 < t2, "markers must carry distinct commit instants")
    assert(ManifestPrune.versionAsOf(spark, root, t1) === 1L)
    assert(ManifestPrune.versionAsOf(spark, root, (t1 + t2) / 2) === 1L)
    assert(ManifestPrune.versionAsOf(spark, root, t2) === 2L)
    assert(ManifestPrune.versionAsOf(spark, root,
      t2 + 1000L * 3600 * 24) === 2L)
    // version 0 (base layout) is reachable just before the first commit
    assert(ManifestPrune.versionAsOf(spark, root, t1 - 1) === 0L)
    // and the reads carry the right row sets
    val n0 = docs.count()
    val n1 = ManifestPrune.readAsOf(spark, root, t1).count()
    val n2 = ManifestPrune.readAsOf(spark, root, t2).count()
    assert(n1 === docs.filter(col("doc_id") % 19 =!= 7).count())
    assert(n2 === docs.filter(col("doc_id") % 19 =!= 7 &&
      col("doc_id") % 23 =!= 5).count())
    assert(ManifestPrune.readAsOf(spark, root, t1 - 1).count() === n0)
  }

  test("as-of before table creation fails with a clear error, " +
    "never an empty or wrong read") {
    val (root, t1, _) = chain()
    val t0 = ManifestPrune.commitTimeMs(root, 0L).get
    assert(t0 <= t1)
    val e = intercept[IllegalArgumentException] {
      ManifestPrune.versionAsOf(spark, root, t0 - 10000)
    }
    assert(e.getMessage.contains("precedes the table's creation"))
  }

  test("as-of resolving to a vacuumed version fails cleanly, naming " +
    "the earliest readable version") {
    val (root, t1, _) = chain()
    // expire everything but the head; markers survive, so the
    // TIMELINE still knows t1 maps to version 1 — and must refuse
    ManifestPrune.expireVersions(spark, root, keepLast = 1, graceMs = 0L)
    assert(ManifestPrune.commitTimeMs(root, 1L).isDefined,
      "expiry must retain the commit marker timeline")
    val e = intercept[IllegalStateException] {
      ManifestPrune.versionAsOf(spark, root, t1)
    }
    assert(e.getMessage.contains("expired by vacuum"))
    assert(e.getMessage.contains("earliest still-readable version is 2"))
    // the head stays readable at its own instant
    val t2 = ManifestPrune.commitTimeMs(root, 2L).get
    assert(ManifestPrune.versionAsOf(spark, root, t2) === 2L)
  }
}
