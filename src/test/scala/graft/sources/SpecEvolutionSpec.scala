package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Clustering-spec evolution (evolveClustering): the commit is
  * metadata-only, old files stay readable AND prunable under their
  * recorded spec, new files prune on the new column, mixed-spec
  * chains read exactly, and compaction is what physically applies the
  * spec — the Iceberg partition-spec-evolution contract on the graft
  * chain. */
class SpecEvolutionSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  private def fresh(tag: String): String = {
    val root = graft.Tables.matDir(s"spec_${tag}_${System.nanoTime}",
      spark, sf0001)
    ManifestPrune.buildLayout(docs, root, nFiles = 4)
    root
  }

  test("evolution commit moves no data, compaction re-clusters, and " +
    "both eras prune on their own column") {
    val root = fresh("evo")
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    val f1 = spark.read.parquet(ManifestPrune.manifestOf(root, 1L))
      .select("file").collect().map(_.getString(0)).toSet
    val v2 = ManifestPrune.evolveClustering(spark, root, "doc_id",
      Seq("doc_id"))
    assert(v2 === 2L)
    // metadata-only: identical file set, spec recorded
    val f2 = spark.read.parquet(ManifestPrune.manifestOf(root, 2L))
      .select("file").collect().map(_.getString(0)).toSet
    assert(f2 === f1)
    assert(ManifestPrune.specOfVersion(root, 2L).statsCol === "doc_id")
    assert(ManifestPrune.specOfVersion(root, 1L).statsCol === "n_chars")
    // compaction applies the new spec physically
    ManifestPrune.compactCommit(spark, root, nFiles = 4)
    assert(ManifestPrune.specOfVersion(root, 3L).statsCol === "doc_id")
    // pre-evolution version prunes on n_chars, head prunes on doc_id:
    // both plans must name strictly fewer files than their manifests
    val planned1 = ManifestPrune.planRangeCommitted(spark, root, 1L,
      "n_chars", 100, 140)
    assert(planned1.nonEmpty && planned1.size < f1.size,
      s"v1 n_chars plan ${planned1.size} of ${f1.size} — no pruning")
    val f3 = spark.read.parquet(ManifestPrune.manifestOf(root, 3L))
      .count()
    val planned3 = ManifestPrune.planRangeCommitted(spark, root, 3L,
      "doc_id", 0, 300)
    assert(planned3.nonEmpty && planned3.size < f3,
      s"v3 doc_id plan ${planned3.size} of $f3 — no pruning")
    // a doc_id plan against the PRE-evolution version cannot prune
    // (its files' stats are n_chars) but must still read exactly
    val planned1d = ManifestPrune.planRangeCommitted(spark, root, 1L,
      "doc_id", 0, 300)
    assert(planned1d.size === f1.size)
  }

  test("mixed-spec reads are exact: MoR delta appended after " +
    "evolution prunes on the new column while base files always read") {
    val root = fresh("mix")
    ManifestPrune.evolveClustering(spark, root, "doc_id", Seq("doc_id"))
    // delta file written under spec 1 (doc_id stats): shifted inserts
    // (updates frame is schema-only — zero rows satisfies the SET
    // contract, which checks columns, not cardinality)
    ManifestPrune.morMergeCommit(spark, root,
      docs.limit(0).select(col("doc_id"),
        lit(null).cast("string").as("lang")),
      docs.filter(col("doc_id") % 31 === 3)
        .select((col("doc_id") + 30000000L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    val head = ManifestPrune.currentVersion(spark, root)
    // doc_id range covering ONLY the shifted delta: base files (spec
    // 0) are unprunable on doc_id and all read; delta files prune
    val got = ManifestPrune.readRangeCommitted(spark, root, head,
        "doc_id", 30000000L, 40000000L)
      .agg(count(lit(1)), sum(col("doc_id"))).collect().head
    val expect = docs.filter(col("doc_id") % 31 === 3)
      .select((col("doc_id") + 30000000L).as("doc_id"))
      .agg(count(lit(1)), sum(col("doc_id"))).collect().head
    assert(got === expect)
    // and an n_chars read across the mixed chain is exact too
    val got2 = ManifestPrune.readRangeCommitted(spark, root, head,
        "n_chars", 100, 180)
      .agg(count(lit(1))).collect().head.getLong(0)
    val expect2 = docs.filter(col("n_chars").between(100, 180)).count() +
      docs.filter(col("doc_id") % 31 === 3 &&
        col("n_chars").between(100, 180)).count()
    assert(got2 === expect2)
  }

  test("describeHistory reports the evolution as evolve-spec and " +
    "restore carries the spec pointer") {
    val root = fresh("hist")
    ManifestPrune.evolveClustering(spark, root, "doc_id", Seq("doc_id"))
    ManifestPrune.dvDeleteCommit(spark, root,
      docs.filter(col("doc_id") % 5 === 0).select("doc_id"))
    val kinds = ManifestPrune.describeHistory(spark, root)
      .orderBy("version").select("kind")
      .collect().map(_.getString(0)).toSeq
    assert(kinds === Seq("base", "evolve-spec", "dv-delete"))
    // restore of a post-evolution version keeps its spec
    ManifestPrune.restoreVersion(spark, root, 1L)
    assert(ManifestPrune.specOfVersion(root,
      ManifestPrune.currentVersion(spark, root)).statsCol === "doc_id")
  }
}
