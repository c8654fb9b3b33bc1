package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the per-operator inventory (SURVEY.md §2 + the
  * LLM-pipeline north-star operators); every entry with SQL in
  * `oracleSql` is verified by the driver against DuckDB on the same
  * parquet tables — column names and ORDER BY are kept identical on
  * both sides, and all double aggregation goes through exact decimal
  * arithmetic so value hashes match bit-for-bit.
  */
object SparkEntry {

  // fully-qualified: the `queries` member below shadows the package name
  private val battery: Seq[_root_.graft.queries.CoreQueries.Q] =
    _root_.graft.queries.CoreQueries.all ++
      text.TextQueries.all ++
      dedup.DedupQueries.all ++
      similarity.SimilarityQueries.all ++
      multimodal.MultimodalQueries.all ++
      temporal.TemporalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The reference's whole pipeline shape (extract → filter →
    * countDistinct → sort) over the documents table. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_incoming_refs")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    battery.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    battery.collect { case q if q.sql.isDefined => q.name -> q.sql.get }.toMap
}
