package graft.similarity

import graft.{SparkEntry, SparkSpec}

/** Analytic invariants of the exact SS decomposition: ssw2 = n·Σ|x|² −
  * |Σx|² must be a true within-cluster scatter (non-negative by
  * Cauchy-Schwarz, zero only for singleton/identical clusters) and the
  * membership must be the SAME assignment q_kmeans reports. */
class KmeansQualitySpec extends SparkSpec {

  test("q_kmeans_quality: Cauchy-Schwarz bounds and membership parity") {
    val q = SparkEntry.queries("q_kmeans_quality")(spark, sf001).collect()
    assert(q.length === 8)
    q.foreach { r =>
      val (n, sumNn, ss2, ssw2) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ssw2 === n * sumNn - ss2)
      // Cauchy-Schwarz: |Σx|² <= n·Σ|x|²
      assert(ssw2 >= 0, s"cluster ${r.getInt(0)}: negative scatter $ssw2")
      // real data in 64 dims: clusters of n>1 are never perfectly tight
      if (n > 1) assert(ssw2 > 0)
    }
    val km = SparkEntry.queries("q_kmeans")(spark, sf001).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val qn = q.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(qn === km, "quality rows disagree with q_kmeans membership")
  }
}
