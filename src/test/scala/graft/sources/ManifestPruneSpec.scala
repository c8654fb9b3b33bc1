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

  test("compaction shrinks the file count, preserves data and skipping") {
    val root = ManifestPrune.ensureLayout(spark, sf0001)
    val (dataDir, mfDir) = ManifestPrune.compactLayout(spark, root, 2)
    val mf = spark.read.parquet(mfDir).collect()
    assert(mf.length === 2, s"expected 2 compacted files, got ${mf.length}")
    // data identical
    val before = spark.read.parquet(s"$root/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val after = spark.read.parquet(dataDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after === before)
    // clustering preserved: the two files' key ranges do not overlap
    val ranges = mf.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges(0)._2 <= ranges(1)._1,
      s"compacted files overlap: $ranges")
    // the old layout is untouched (swap-by-path, readers stay valid)
    assert(ManifestPrune.totalFiles(spark, root) === 8L)
  }

  test("manifest tree: shard-pruned planning matches the flat plan " +
    "and stays inside the driver bound where flat planning cannot") {
    val root = ManifestPrune.ensureLayout(spark, sf0001)
    val tree = ManifestPrune.buildManifestTree(spark, root,
      s"$root/manifest", nShards = 4)
    // list is shard-count-sized and covers the full key span
    val list = spark.read.parquet(s"$tree/list").collect()
    assert(list.length === 4)
    assert(list.map(_.getLong(3)).sum === 8L) // n_files adds up
    // equivalence: tree planning names the same files as flat planning
    for ((lo, hi) <- Seq((100L, 180L), (0L, 10000L), (-5L, -1L))) {
      assert(ManifestPrune.planFilesTree(spark, tree, lo, hi).toSet ===
        ManifestPrune.planFiles(spark, root, lo, hi).toSet)
      val treeRead = ManifestPrune
        .readRangeTree(spark, root, tree, lo, hi)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val plain = graft.Tables.load(spark, sf0001, "documents")
        .filter(col("n_chars") >= lo && col("n_chars") <= hi)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(treeRead === plain)
    }
    // the scale point: under a bound the FULL 8-file list exceeds,
    // the tree still plans a selective range (only overlapping
    // shards' rows materialize), while the flat plan of the same
    // whole table refuses
    spark.conf.set("graft.manifest.maxDriverFiles", "3")
    try {
      intercept[IllegalStateException] {
        ManifestPrune.planFiles(spark, root, Long.MinValue, Long.MaxValue)
      }
      val narrow = ManifestPrune.planFilesTree(spark, tree, 100L, 110L)
      assert(narrow.nonEmpty && narrow.size <= 3)
      // a full scan through the tree pays the full list — and says so
      intercept[IllegalStateException] {
        ManifestPrune.planFilesTree(spark, tree, Long.MinValue,
          Long.MaxValue)
      }
    } finally spark.conf.unset("graft.manifest.maxDriverFiles")
  }

  test("an absurd driver file bound clamps instead of emptying plans") {
    val root = ManifestPrune.ensureLayout(spark, sf0001)
    spark.conf.set("graft.manifest.maxDriverFiles",
      Long.MaxValue.toString)
    try {
      // pre-clamp, cap+1 overflowed into limit(0) and planning
      // silently returned ZERO files — wrong answers with no error
      val files = ManifestPrune.planFiles(spark, root, 100, 180)
      assert(files.nonEmpty)
    } finally spark.conf.unset("graft.manifest.maxDriverFiles")
  }

  test("planning fails fast past the driver file-list bound") {
    val root = ManifestPrune.ensureLayout(spark, sf0001)
    // adversarial count: bound below the layout's 8 files — every
    // list-materializing plan must refuse with the compaction pointer
    // instead of collecting an unbounded manifest onto the driver
    spark.conf.set("graft.manifest.maxDriverFiles", "2")
    try {
      val e1 = intercept[IllegalStateException] {
        ManifestPrune.readVersion(spark, s"$root/manifest")
      }
      assert(e1.getMessage.contains("compact"))
      val e2 = intercept[IllegalStateException] {
        ManifestPrune.planFiles(spark, root, Long.MinValue, Long.MaxValue)
      }
      assert(e2.getMessage.contains("maxDriverFiles"))
      // a SELECTIVE plan under the same bound still succeeds — the
      // bound applies to what is actually collected, so pruning keeps
      // a huge table plannable when the predicate is tight
      val narrow = ManifestPrune.planFiles(spark, root, 100, 110)
      assert(narrow.nonEmpty && narrow.size <= 2)
    } finally spark.conf.unset("graft.manifest.maxDriverFiles")
  }
}
