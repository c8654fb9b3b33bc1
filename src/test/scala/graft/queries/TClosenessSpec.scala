package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Analytic invariants of the t-closeness audit beyond the DuckDB hash
  * gate — properties the scaled total-variation arithmetic must obey
  * for EVERY class, on any data. */
class TClosenessSpec extends SparkSpec {

  test("q_t_closeness: TV bounds, parity, and threshold consistency") {
    val rows = SparkEntry.queries("q_t_closeness")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, tvNum, denom, viol) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n > 0 && denom > 0)
      // TV in [0, 1]: 0 <= tv_num <= denom = 2*n_c*N
      assert(tvNum >= 0 && tvNum <= denom,
        s"TV out of range: $tvNum / $denom")
      // Σ_s (n_cs·N − n_s·n_c) = 0, so the absolute sum is EVEN
      assert(tvNum % 2 === 0, s"tv_num $tvNum is odd")
      // violates_t02 is exactly the 5·tv_num > denom predicate
      assert(viol === (if (5 * tvNum > denom) 1L else 0L))
    }
    // the audit must see real deviation somewhere AND not everywhere
    val flags = rows.map(_.getLong(5)).sum
    assert(flags > 0 && flags < rows.length,
      s"degenerate audit: $flags/${rows.length} classes flagged")
  }

  test("privacy triad shares its equivalence classes") {
    // t-closeness rows are keyed by the same (event_type, vb) classes
    // k-anonymity aggregates; the total row mass must match
    val tRows = SparkEntry.queries("q_t_closeness")(spark, sf001)
      .collect().map(_.getLong(2)).sum
    val kRows = SparkEntry.queries("q_k_anonymity")(spark, sf001)
      .collect().map(r => r.getLong(0) * r.getLong(1)).sum
    assert(tRows === kRows,
      s"class mass differs: t-closeness $tRows vs k-anonymity $kRows")
  }
}
