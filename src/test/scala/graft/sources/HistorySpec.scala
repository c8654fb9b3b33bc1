package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** describeHistory's contract beyond the q_table_history hash gate:
  * metadata-only row arithmetic per version, kind inference, note
  * pass-through, and the post-vacuum shape — expired versions drop
  * out and the first surviving version re-labels as `base` (its
  * predecessor is unknowable, which is the honest answer). */
class HistorySpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  test("history rows carry kind + row arithmetic and survive vacuum " +
    "with an honest base relabel") {
    val root = graft.Tables.matDir(s"hist_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 19 === 7).select("doc_id"))
    ManifestPrune.noteCommit(root, 1L, "del:0")
    ManifestPrune.compactCommit(spark, root, nFiles = 2)
    val n = docs.count()
    val d = docs.filter(col("doc_id") % 19 === 7).count()

    val h = ManifestPrune.describeHistory(spark, root)
      .orderBy("version").collect()
    assert(h.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((0L, "base"), (1L, "dv-delete"), (2L, "rewrite")))
    // (physical, hidden, live) per version
    assert(h.map(r => (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq === Seq((n, 0L, n), (n, d, n - d), (n - d, 0L, n - d)))
    assert(h(1).getString(7) === "del:0")
    assert(h.forall(_.getLong(6) > 0L)) // committed_at_ms populated

    ManifestPrune.expireVersions(spark, root, keepLast = 1, graceMs = 0L)
    val h2 = ManifestPrune.describeHistory(spark, root)
      .orderBy("version").collect()
    assert(h2.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((2L, "base")))
    assert(h2.head.getLong(5) === n - d)
  }
}
