package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q_quantiles_approx: the sketch sibling has no value-hash oracle
  * (GK quantiles return actual data values, the oracle interpolates),
  * so its correctness contract is pinned here — same groups, exact
  * min/max, and each approximate quartile bracketed by the exact
  * neighboring quartiles with a rank-error-sized tolerance. */
class QuantilesApproxSpec extends SparkSpec {

  private def bySource(name: String) =
    SparkEntry.queries(name)(spark, sf001)
      .collect().map(r => r.getString(0) -> r).toMap

  private lazy val approx = bySource("q_quantiles_approx")
  private lazy val exact = bySource("q_quantiles")

  test("same sources, exact min/max agree with q_quantiles") {
    assert(approx.keySet === exact.keySet)
    for ((src, a) <- approx) {
      val e = exact(src)
      assert(a.getLong(1) === e.getLong(1), s"$src: min_chars")
      assert(a.getLong(5) === e.getLong(5), s"$src: max_chars")
    }
  }

  test("approximate quartiles are ordered and near the exact ones") {
    for ((src, a) <- approx) {
      val e = exact(src)
      val (p25, p50, p75) = (a.getLong(2), a.getLong(3), a.getLong(4))
      assert(p25 <= p50 && p50 <= p75, s"$src: quartiles out of order")
      // accuracy 10000 on sf0.01 group sizes (~250) makes the sketch
      // rank-exact; the residual gap to the oracle's type-7 value is at
      // most one inter-order-statistic step, bounded here by 10% of the
      // group's spread — generous but still catches a wrong plan
      val spread = (e.getLong(5) - e.getLong(1)).toDouble.max(1.0)
      for ((est, ex, nm) <- Seq(
          (p25.toDouble, e.getDouble(2), "p25"),
          (p50.toDouble, e.getDouble(3), "p50"),
          (p75.toDouble, e.getDouble(4), "p75")))
        assert(math.abs(est - ex) <= 0.10 * spread,
          s"$src/$nm: approx $est vs exact $ex (spread $spread)")
    }
  }
}
