package graft.dedup

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain: labels propagate across the diameter") {
    // 5 -> 4 -> 3 -> 2 -> 1: needs multiple rounds; everyone -> 1
    val got = cc((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("two components stay separate") {
    val got = cc((1L, 2L), (2L, 3L), (10L, 11L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("triangle with duplicate and self edges") {
    val got = cc((7L, 8L), (8L, 9L), (9L, 7L), (7L, 8L), (9L, 9L))
    assert(got === Map(7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("star: hub propagates in one round regardless of fan-out") {
    val got = cc((1 to 20).map(i => (100L, 100L + i)): _*)
    assert(got.values.toSet === Set(100L))
    assert(got.size === 21)
  }

  test("direction of the input pair does not matter") {
    assert(cc((2L, 1L), (3L, 2L)) === cc((1L, 2L), (2L, 3L)))
  }

  test("path graph of 120 nodes: O(log n) rounds, not O(diameter)") {
    // the adversarial long-chain input that kills diameter-bound
    // min-label propagation; large-star/small-star must converge
    val got = cc((1L until 120L).map(i => (i, i + 1)): _*)
    assert(got.size === 120)
    assert(got.values.toSet === Set(1L))
  }

  test("descending path with non-contiguous ids") {
    val ids = (0 until 101).map(i => 1000L - 7L * i)
    val got = cc(ids.sliding(2).map(p => (p(0), p(1))).toSeq: _*)
    assert(got.size === 101)
    assert(got.values.toSet === Set(ids.min))
  }

  test("matches union-find on a pseudo-random multi-component graph") {
    // deterministic LCG edges over 300 nodes: several components of
    // varied shape (chains, merges, isolated pairs)
    var seed = 12345L
    def nxt(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L) & 0x7fffffffL; seed }
    val es = (1 to 220).map { _ => (nxt() % 300, nxt() % 300) }
    // reference: classic union-find on the driver
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    assert(cc(es: _*) === want)
  }
}
