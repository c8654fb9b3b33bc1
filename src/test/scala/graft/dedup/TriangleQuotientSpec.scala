package graft.dedup

import graft.SparkSpec

/** Pins [[TriangleQuotient.nodeStats]] against a brute-force
  * document-level reference: all-pairs hamming<=3 adjacency, explicit
  * neighbor-set triangle counting. The quotient path's four-term
  * split (in-class, mixed, same-neighbor-class, class-triangle) must
  * reproduce the enumeration exactly for every multiplicity shape —
  * the blow-up argument is only as good as its bookkeeping. */
class TriangleQuotientSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force (deg, n_tri) per doc over (doc_id, hi, lo) rows. */
  private def ref(fps: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] = {
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    val byId = fps.map(f => f._1 -> ((f._2, f._3))).toMap
    val ids = fps.map(_._1)
    val nb = collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    for (a <- ids; b <- ids if a < b && ham(byId(a), byId(b)) <= 3) {
      nb(a) += b; nb(b) += a
    }
    ids.map { v =>
      val ns = nb(v).toIndexedSeq
      val tri = (for {
        i <- ns.indices; j <- (i + 1) until ns.size
        if nb(ns(i)).contains(ns(j))
      } yield 1).size
      v -> ((nb(v).size.toLong, tri.toLong))
    }.toMap
  }

  private def got(fps: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] =
    TriangleQuotient.nodeStats(fps.toDF("doc_id", "hi", "lo"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def check(fps: Seq[(Long, Long, Long)]): Unit =
    assert(got(fps) === ref(fps))

  test("single multiplicity class is a clique: internal term only") {
    // five identical fingerprints: K5 — deg 4, C(4,2)=6 triangles each
    val fps = (1L to 5L).map(i => (i, 7L, 9L))
    val g = got(fps)
    assert(g === (1L to 5L).map(_ -> ((4L, 6L))).toMap)
    check(fps)
  }

  test("two adjacent classes exercise the mixed and neighbor-pair terms") {
    // class A (m=3, fp 0/0) ~ class B (m=2, fp 0/1, hamming 1)
    val fps = Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L),
      (10L, 0L, 1L), (11L, 0L, 1L))
    check(fps)
  }

  test("class triangle exercises the cross-class term") {
    // three singleton classes pairwise within hamming 3 — one triangle
    val fps = Seq((1L, 0L, 0L), (2L, 0L, 1L), (3L, 0L, 2L))
    assert(got(fps) === Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L)),
      3L -> ((2L, 1L))))
    check(fps)
  }

  test("class triangle with multiplicities weights corners by sizes") {
    // sizes 2/3/4, pairwise adjacent: node in the size-2 class sees
    // 1 in-class + 7 outside; cross term 3*4 etc.
    val fps = (Seq.fill(2)((0L, 0L)) ++ Seq.fill(3)((0L, 1L)) ++
      Seq.fill(4)((0L, 2L))).zipWithIndex
      .map { case ((hi, lo), i) => (i.toLong, hi, lo) }
    check(fps)
  }

  test("open class wedge closes nothing across non-adjacent ends") {
    // A(0) ~ B(2 bits away) ~ C(4 bits from A): A-C NOT adjacent —
    // triangles only via B-internal pairs
    val fps = Seq((1L, 0L, 0L), (2L, 0L, 0L),
      (10L, 0L, 3L), (11L, 0L, 3L),
      (20L, 0L, 15L))
    check(fps)
  }

  test("isolated docs report (0, 0) and hub chains stay exact") {
    // fingerprints pairwise >= 8 bits apart — genuinely isolated
    val fps = Seq((1L, 0L, 0L), (2L, 0xFFL, 0L), (3L, 0L, 0xFF00L))
    assert(got(fps) === Map(1L -> ((0L, 0L)), 2L -> ((0L, 0L)),
      3L -> ((0L, 0L))))
  }

  test("seeded random fingerprint soup matches the enumeration") {
    // clustered random fps: ~12 base patterns, each perturbed by 0-3
    // random bit flips, plus multiplicity — adversarial for every term
    val rnd = new scala.util.Random(42)
    val bases = IndexedSeq.fill(12)((rnd.nextLong(), rnd.nextLong()))
    val fps = (0 until 90).map { i =>
      val (bh, bl) = bases(rnd.nextInt(bases.size))
      var (h, l) = (bh, bl)
      (0 until rnd.nextInt(4)).foreach { _ =>
        val bit = rnd.nextInt(64)
        if (rnd.nextBoolean()) h ^= (1L << bit) else l ^= (1L << bit)
      }
      // keep hi/lo in the 32-bit halves bandedRows expects
      (i.toLong, h >>> 32, l >>> 32)
    }
    check(fps)
  }
}
