package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** CHECK constraints on the version chain (Delta ADD CONSTRAINT
  * analogue): registered expressions are enforced over each commit's
  * NEWLY WRITTEN rows only (O(new rows), never a table scan), a
  * violation aborts before any manifest exists (prepared garbage
  * only, table state untouched), DV deletes stay constraint-free
  * (they write no rows), and the opt-in retro-check covers existing
  * data. */
class ConstraintSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  private def fresh(): String = {
    val root = graft.Tables.matDir(s"ck_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    root
  }

  test("a violating merge aborts before publish; a clean one lands") {
    val root = fresh()
    ManifestPrune.addConstraint(root, "chars-positive", "n_chars >= 0")
    ManifestPrune.addConstraint(root, "lang-known", "length(lang) = 2")
    val empty = docs.limit(0).select(col("doc_id"), col("text"),
      col("lang"), col("source"), col("n_chars"))
    // clean multi-column merge passes both constraints
    val v1 = ManifestPrune.mergeIntoCommit(spark, root,
      docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), lit("xx").as("lang")), empty)
    assert(v1 === 1L)
    // a merge writing a 3-letter lang violates 'lang-known' and must
    // not commit — version unchanged, head readable and unchanged
    val before = ManifestPrune.readCommitted(spark, root, v1).count()
    val e = intercept[IllegalStateException] {
      ManifestPrune.mergeIntoCommit(spark, root,
        docs.filter(col("doc_id") % 7 === 1)
          .select(col("doc_id"), lit("xxx").as("lang")), empty)
    }
    assert(e.getMessage.contains("lang-known"))
    assert(ManifestPrune.currentVersion(spark, root) === v1)
    assert(ManifestPrune.readCommitted(spark, root, v1).count()
      === before)
    // violating INSERTS are caught too
    intercept[IllegalStateException] {
      ManifestPrune.mergeIntoCommit(spark, root,
        docs.limit(0).select(col("doc_id"), lit("aa").as("lang")),
        docs.limit(1).select((col("doc_id") + 90000000L).as("doc_id"),
          col("text"), col("lang"), col("source"),
          lit(-5L).as("n_chars")))
    }
    assert(ManifestPrune.currentVersion(spark, root) === v1)
    // dropping the constraint unblocks the same merge
    assert(ManifestPrune.dropConstraint(root, "lang-known"))
    val v2 = ManifestPrune.mergeIntoCommit(spark, root,
      docs.filter(col("doc_id") % 7 === 1)
        .select(col("doc_id"), lit("xxx").as("lang")), empty)
    assert(v2 === 2L)
  }

  test("DV deletes bypass row checks; retro-validation is opt-in") {
    val root = fresh()
    ManifestPrune.addConstraint(root, "impossible", "n_chars > 1000000")
    // a DV delete writes no rows — never blocked by constraints
    val v1 = ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 19 === 7).select("doc_id"))
    assert(v1 === 1L)
    // the retro-check tells the truth about existing data
    val e = intercept[IllegalStateException] {
      ManifestPrune.validateConstraints(spark, root, v1)
    }
    assert(e.getMessage.contains("impossible"))
    ManifestPrune.dropConstraint(root, "impossible")
    ManifestPrune.addConstraint(root, "sane", "n_chars >= 0")
    ManifestPrune.validateConstraints(spark, root, v1) // passes
  }
}
