package graft.text

import graft.{SparkEntry, SparkSpec}

/** KMV estimator quality: the gated row already carries estimate AND
  * exact truth; this pins the statistical contract — every pair's
  * bottom-64 Jaccard estimate sits within a conservative error band
  * of the exact value (σ ≈ √(J(1−J)/k) ≈ 0.06 at k = 64; band 4σ+),
  * and a pair whose union fits inside the sketch is EXACT. */
class KmvJaccardSpec extends SparkSpec {

  test("bottom-64 Jaccard estimates stay within the error band") {
    val rows = SparkEntry.queries("q_kmv_jaccard")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    var maxErr = 0.0
    rows.foreach { r =>
      val (kUsed, jNum) = (r.getLong(2), r.getLong(3))
      val (nInter, nUnion) = (r.getLong(4), r.getLong(5))
      assert(kUsed > 0 && kUsed <= 64)
      assert(jNum <= kUsed)
      val est = jNum.toDouble / kUsed
      val exact = nInter.toDouble / nUnion
      val err = math.abs(est - exact)
      maxErr = math.max(maxErr, err)
      assert(err <= 0.25,
        s"pair ${r.getString(0)}-${r.getString(1)}: est $est exact $exact")
      // exhaustive case: union inside the sketch => estimator is exact
      if (nUnion <= 64)
        assert(jNum === nInter && kUsed === nUnion)
    }
    info(f"max |est - exact| over ${rows.length} pairs = $maxErr%.3f")
  }
}
