package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** Symmetric edge frame from undirected pairs. */
  private def sym(pairs: (Long, Long)*): DataFrame = {
    val p = pairs.toDF("a", "b")
    p.selectExpr("a as u", "b as v")
      .union(p.selectExpr("b as u", "a as v"))
  }

  private def core(k: Int, rounds: Int, pairs: (Long, Long)*): Map[Long, Long] =
    KCore.coreDegrees(sym(pairs: _*), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle survives the 2-core intact") {
    val got = core(2, 4, (1L, 2L), (2L, 3L), (1L, 3L))
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("pendant chain hanging off a triangle peels away round by round") {
    // 1-2-3 triangle with tail 3-4-5-6: tail needs one peel per hop,
    // so the round bound is the tail LENGTH (peel depth), not log n
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(core(2, 4, pairs: _*) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // under-provisioned rounds leave tail remnants — demonstrates why
    // the fixpoint assertion below matters
    assert(core(2, 1, pairs: _*).keySet.contains(4L))
  }

  test("pure path graph peels to nothing") {
    val pairs = (1L until 8L).map(i => (i, i + 1))
    assert(core(2, 7, pairs: _*) === Map.empty[Long, Long])
  }

  test("cycle is its own 2-core at any length") {
    val n = 30L
    val pairs = (1L until n).map(i => (i, i + 1)) :+ ((n, 1L))
    val got = core(2, 3, pairs: _*)
    assert(got.size === n)
    assert(got.values.toSet === Set(2L))
  }

  test("3-core separates the clique from its 2-core shell") {
    // K4 {1,2,3,4} plus a square {10,11,12,13}: the square is a 2-core
    // but has no 3-core
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val sq = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val got = core(3, 4, (k4 ++ sq): _*)
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("q_kcore's 6 rounds reach the fixpoint on the real sf0.001/sf0.01 graphs") {
    // the hash-gate precondition: one extra peel changes nothing, so
    // the unrolled 6-layer oracle sees the converged edge set
    for (d <- Seq(sf0001, sf001)) {
      val q = graft.SparkEntry.queries("q_kcore")
      val at6 = q(spark, d).collect().toSeq
      // recompute at 7 rounds through the same pair table
      val p = spark.read.parquet(
        graft.Tables.matDir("simhash_pairs", spark, d))
      val edges = p.selectExpr("a_id as u", "b_id as v")
        .union(p.selectExpr("b_id as u", "a_id as v"))
      val at7 = KCore.coreDegrees(edges, 2, 7).orderBy("doc_id").collect().toSeq
      assert(at6 === at7, s"k-core not converged in 6 rounds at $d")
    }
  }
}
