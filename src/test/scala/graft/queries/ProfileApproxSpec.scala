package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q_profile_approx: the HLL profiling sibling has no value-hash oracle
  * (sketch internals differ per engine), so its correctness contract is
  * pinned here instead — same rows/columns/exact fields as q_profile,
  * and the approximate distinct counts within the advertised error of
  * the exact ones. */
class ProfileApproxSpec extends SparkSpec {

  private lazy val approx = SparkEntry.queries("q_profile_approx")(spark, sf001)
    .collect().map(r => r.getString(0) -> r).toMap
  private lazy val exact = SparkEntry.queries("q_profile")(spark, sf001)
    .collect().map(r => r.getString(0) -> r).toMap

  test("same profiled columns, same exact fields as q_profile") {
    assert(approx.keySet === exact.keySet)
    for ((c, a) <- approx) {
      val e = exact(c)
      assert(a.getLong(1) === e.getLong(1), s"$c: n")            // n
      assert(a.getLong(2) === e.getLong(2), s"$c: n_nonnull")    // n_nonnull
      assert(a.get(4) === e.get(4), s"$c: vmin")
      assert(a.get(5) === e.get(5), s"$c: vmax")
    }
  }

  test("approximate distinct counts within 3x the advertised rsd (5%)") {
    for ((c, a) <- approx) {
      val nd = exact(c).getLong(3).toDouble
      val est = a.getLong(3).toDouble
      assert(math.abs(est - nd) <= math.max(0.15 * nd, 2.0),
        s"$c: approx $est vs exact $nd")
    }
  }
}
