package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Every battery query must run at sf0.001 and return a sane frame.
  * (Value-level correctness is enforced by the DuckDB oracle gate —
  * tools/oracle_check.py replays it locally; this suite guards
  * compilation/runtime of each plan and result-shape invariants.) */
class BatterySpec extends SparkSpec {

  val mayBeEmpty = Set("q_anti_join", "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard", "q_dedup_embedding")

  /** Queries that deliberately carry NO oracle SQL (driver records the
    * weaker rows-only check). Each needs a reason and its own value
    * spec: q_profile_approx — HLL sketch values legitimately differ
    * per engine; pinned against exact q_profile in ProfileApproxSpec.
    * q_quantiles_approx — GK-sketch quantiles pick actual data values,
    * not the oracle's type-7 interpolation; pinned against exact
    * q_quantiles in QuantilesApproxSpec. */
  // the approx siblings and the sketch table: no SQL oracle can replay
  // sketch internals, so each is spec-bounded instead (ProfileApprox/
  // QuantilesApprox/SketchTable specs) and plan-gated in PlanShapeSpec
  val oracleExempt =
    Set("q_profile_approx", "q_quantiles_approx", "q_sketch_table")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
      assert(df.columns.length === df.columns.distinct.length,
        s"$name has duplicate column names")
    }
  }

  test("every query name has oracle SQL (full oracle coverage)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet --
      oracleExempt
    assert(missing.isEmpty, s"queries without oracle: $missing")
    // exemptions must stay real queries (catch stale entries)
    assert((oracleExempt -- SparkEntry.queries.keySet).isEmpty)
    // ... and must not silently GAIN an oracle while listed here
    assert((oracleExempt & SparkEntry.oracleSql.keySet).isEmpty)
  }

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle column names match spark column names per query") {
    // cheap static guard: every alias in the spark result must appear in
    // the SQL text (driver compare sorts by column name)
    SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot(q => oracleExempt(q._1)).foreach { case (name, fn) =>
      val cols = fn(spark, sf0001).columns
      val sql = SparkEntry.oracleSql(name).toLowerCase
      cols.foreach { c =>
        assert(sql.contains(c.toLowerCase),
          s"$name: spark column '$c' not mentioned in oracle SQL")
      }
    }
  }
}
