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
}
