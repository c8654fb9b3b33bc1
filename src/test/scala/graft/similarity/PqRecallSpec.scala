package graft.similarity

import graft.{SparkEntry, SparkSpec}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** PQ/ADC quality contract: the compressed search must (1) rank a
  * codebook seed's own vector at distance-estimate 0 for itself-as-
  * query (ADC is EXACT when the corpus vector sits on its centroid),
  * and (2) retain a usable fraction of the exact L2 top-5 — the
  * recall bar that catches a broken encode or a transposed dtable
  * while tolerating the quantization loss an M=2, K=8 seed codebook
  * necessarily has. */
class PqRecallSpec extends SparkSpec {

  private def scaledAll = spark.read
    .parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id"), vecScaled(col("embedding")).as("sv"))

  test("ADC estimate is exact for vectors on their own centroid") {
    // seed vectors (vec_id < 8) are the codebook; query q < 5 is also
    // a seed, so its own encoded distance is d2(q, q) = 0 in BOTH
    // subspaces — the PQ answer ranks every other seed by its true
    // centroid distance with no quantization error.
    val pq = SparkEntry.queries("q_ann_pq")(spark, sf0001)
    // for query 0, neighbor seeds 1..7 carry their exact d2 — strictly
    // positive, and the estimate for any seed equals brute d2
    val ests = pq.filter(col("query_id") === 0 && col("neighbor_id") < 8)
      .select("neighbor_id", "est").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (ests.nonEmpty) {
      val rows = scaledAll.filter(col("vec_id") < 8)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      val q = rows(0L)
      ests.foreach { case (id, est) =>
        val v = rows(id)
        val exact = q.indices.map { i =>
          val d = q(i) - v(i); d * d
        }.sum
        assert(est === exact,
          s"seed $id: ADC est $est != exact centroid distance $exact")
      }
    }
  }

  test("Lloyd refinement of the subspace codebooks reduces distortion") {
    // the claim the battery query documents ("Lloyd refinement plugs
    // in unchanged") made numeric: k-means training minimizes exactly
    // the quantization error ADC pays, so 3 rounds per subspace must
    // not increase total distortion Σ_m d2(v_m, book_m[code(v_m)]).
    // JVM reference implementation (the spec convention), floor-mean
    // centroids like q_kmeans.
    val rows = scaledAll.collect()
      .map(r => r.getSeq[Long](1).toArray).sortBy(_ => 0) // stable order
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    def half(m: Int)(v: Array[Long]) =
      if (m == 0) v.slice(0, 32) else v.slice(32, 64)
    def distortion(books: Seq[Array[Array[Long]]]): Double =
      rows.map { v =>
        (0 to 1).map { m =>
          books(m).map(c => d2(half(m)(v), c)).min
        }.sum.toDouble
      }.sum / rows.length
    val seeds = rows.take(8)
    var books: Seq[Array[Array[Long]]] =
      Seq(seeds.map(half(0)), seeds.map(half(1)))
    val seedDist = distortion(books)
    for (_ <- 1 to 3) {
      books = (0 to 1).map { m =>
        val assigned = rows.map(v => half(m)(v))
          .groupBy(sub => books(m).zipWithIndex
            .minBy { case (c, i) => (d2(sub, c), i) }._2)
        books(m).zipWithIndex.map { case (old, c) =>
          assigned.get(c) match {
            case Some(members) =>
              Array.tabulate(32)(i =>
                math.floorDiv(members.map(_(i)).sum, members.length))
            case None => old
          }
        }
      }
    }
    val trainedDist = distortion(books)
    info(f"mean quantization distortion: seed $seedDist%.3e -> " +
      f"trained $trainedDist%.3e (${trainedDist / seedDist * 100}%.1f%%)")
    assert(trainedDist <= seedDist * 1.001,
      s"training increased distortion: $seedDist -> $trainedDist")
  }

  test("recall@5 vs exact scaled-L2 top-5 stays above the floor") {
    val e = scaledAll
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("sv").as("qv"))
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("d2",
        aggregate(zip_with(col("sv"), col("qv"),
          (x, y) => (x - y) * (x - y)), lit(0L), (acc, z) => acc + z))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(asc("d2"), asc("vec_id"))
    val exact = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("q_ann_pq")(spark, sf0001)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"PQ recall@5 = $recall%.2f (${(exact & got).size}/${exact.size})")
    assert(recall >= 0.2,
      f"PQ recall@5 $recall%.2f below floor 0.2")
  }
}
