package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The add-nullable-column contract of the two-generation layout:
  * merged reads surface the added column with NULL exactly on the
  * generation written before it existed, and generation-scoped reads
  * stay partition-pruned to that generation's files (the oracle gate
  * proves the reconciled VALUES; this suite pins the read semantics
  * and the pruning). */
class SchemaEvolutionSpec extends SparkSpec {

  lazy val root: String = SchemaEvolution.ensureLayout(spark, sf0001)

  test("merged read carries the added column, null-filled on gen 1") {
    val m = SchemaEvolution.readMerged(spark, root)
    assert(m.columns.contains("lang"))
    // legacy (even doc_id) rows: lang unknown; gen-2 rows: never null
    assert(m.filter(col("doc_id") % 2 === 0 && col("lang").isNotNull)
      .count() === 0)
    assert(m.filter(col("doc_id") % 2 === 1 && col("lang").isNull)
      .count() === 0)
    // nothing lost vs the original table
    assert(m.count() === Tables.load(spark, sf0001, "documents").count())
  }

  test("generation-scoped read is partition-pruned to one gen's files") {
    val scoped = SchemaEvolution.readMerged(spark, root)
      .filter(col("gen") === 2)
    val plan = scoped.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(_.contains("FileScan"))
      .getOrElse(fail(s"no FileScan in plan:\n$plan"))
    assert(scanLine.contains("PartitionFilters: [") &&
      scanLine.contains("gen") &&
      !scanLine.contains("PartitionFilters: []"),
      s"gen filter is not a partition filter:\n$scanLine")
    // and the scoped rows really are one generation
    assert(scoped.count() > 0)
    assert(scoped.filter(col("doc_id") % 2 === 0).count() === 0)
  }
}
