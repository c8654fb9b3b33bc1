package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ManifestPrune contract: files are genuinely skipped, and pruning
  * never changes the answer (exact predicate re-applied after the
  * pruned read). */
class ManifestPruneSpec extends SparkSpec {

  test("range plan opens strictly fewer files than the layout holds") {
    val root = ManifestPrune.ensureLayout(spark, sf0001)
    val total = ManifestPrune.totalFiles(spark, root)
    val planned = ManifestPrune.planFiles(spark, root, 100, 180)
    assert(total === 8L)
    assert(planned.nonEmpty && planned.size < total,
      s"planned ${planned.size} of $total files — no pruning")
  }

  test("pruned read == plain filter on the original table") {
    val root = ManifestPrune.ensureLayout(spark, sf0001)
    val pruned = ManifestPrune.readRange(spark, root, 100, 180)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plain = graft.Tables.load(spark, sf0001, "documents")
      .filter(col("n_chars") >= 100 && col("n_chars") <= 180)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(plain.nonEmpty)
    assert(pruned === plain)
  }

  test("non-overlapping range plans zero files and returns zero rows") {
    val root = ManifestPrune.ensureLayout(spark, sf0001)
    assert(ManifestPrune.planFiles(spark, root, -10, -5).isEmpty)
    assert(ManifestPrune.readRange(spark, root, -10, -5).count() === 0L)
  }
}
