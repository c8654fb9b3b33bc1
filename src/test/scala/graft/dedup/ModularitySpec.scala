package graft.dedup

import graft.{SparkEntry, SparkSpec}

/** Value-level invariants of q_modularity beyond the DuckDB hash gate:
  * the scaled per-community contributions must recombine into a
  * modularity Q inside Newman's analytic range, and the community
  * totals must be consistent with the pair table they grade. */
class ModularitySpec extends SparkSpec {

  test("q_modularity: totals consistent, Q within Newman bounds") {
    val rows = SparkEntry.queries("q_modularity")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val pairs = SparkEntry.queries("q_dedup_simhash64")(spark, sf001).count()
    val m = pairs
    // Σ D_c = 2m (every edge endpoint is in exactly one community)
    assert(rows.map(_.getLong(3)).sum === 2 * m)
    // Σ L_c <= m (intra edges are a subset of all edges)
    val intra = rows.map(_.getLong(2)).sum
    assert(intra <= m && intra >= 0)
    // contributions recombine: contrib = 4mL_c - D_c², Q = Σ/4m²
    rows.foreach { r =>
      assert(r.getLong(4) === 4 * m * r.getLong(2) - r.getLong(3) * r.getLong(3))
    }
    val q = rows.map(_.getLong(4)).sum.toDouble / (4.0 * m * m)
    assert(q >= -0.5 && q <= 1.0, s"modularity $q outside [-1/2, 1]")
    // label propagation on a near-dup graph should find real structure
    assert(q > 0.0, s"modularity $q not positive on the near-dup graph")
  }

  test("q_partition_agreement: refinement identity and Rand bounds") {
    val r = SparkEntry.queries("q_partition_agreement")(spark, sf001)
      .collect().head
    val (n, sij, sa, sb, t2, rand) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(t2 === n * (n - 1))
    // every label-prop community is a SUBSET of a connected component,
    // so each same-community pair is also same-cluster: S_ij == S_b
    assert(sij === sb, s"communities not a refinement: S_ij=$sij S_b=$sb")
    // and the coarser partition holds at least as many pairs
    assert(sa >= sb)
    assert(rand >= 0 && rand <= 1000000L)
    // refinement means only under-merging can disagree: rand misses
    // exactly the (S_a - S_b) cluster pairs split across communities
    assert(rand === (1000000L * (t2 - sa + sb)) / t2)
  }

  test("q_assortativity: sufficient statistics self-consistent, |r| <= 1") {
    val r = SparkEntry.queries("q_assortativity")(spark, sf001)
      .collect().head
    val (m, s1, sab, s2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // num/den compute in decimal128(38,0) (S1² overflows int64 one
    // decade up — caught at the sf1 rung) and are CARRIED as decimal
    // strings: DuckDB's HUGEINT→Arrow export is version-dependent,
    // so the typed oracle compare needs the rendering, not the bits
    val num = BigInt(r.getString(4))
    val den = BigInt(r.getString(5))
    val rr = r.getDouble(6)
    assert(num === 4 * BigInt(m) * sab - BigInt(s1) * s1)
    assert(den === 2 * BigInt(m) * s2 - BigInt(s1) * s1)
    // Cauchy-Schwarz on endpoint degrees: den >= 0; |r| <= 1
    assert(den > 0)
    assert(rr >= -1.0 - 1e-12 && rr <= 1.0 + 1e-12, s"r=$rr")
    // Σ(da+db) over edges counts each node's degree once per incident
    // edge: S1 = Σ_v deg(v)² — cross-check against the degree table
    val e = SparkEntry.queries("q_dedup_simhash64")(spark, sf001)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity)
      .map(_._2.length.toLong)
    assert(m === e.length.toLong)
    assert(s1 === deg.map(x => x * x).sum)
  }

  test("q_label_prop and q_modularity agree on the community partition") {
    val lp = SparkEntry.queries("q_label_prop")(spark, sf001).collect()
    val nodesPerCommunity = lp.groupBy(_.getLong(1)).map { case (c, rs) =>
      c -> rs.length.toLong
    }
    val mod = SparkEntry.queries("q_modularity")(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nodesPerCommunity === mod)
  }
}
