package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_dedup_sparse_cosine's machinery contract: the postings-join
  * formulation (dot products accumulated via equi-join on gram, norms
  * from a separate aggregate, threshold by cross-multiplication) must
  * produce exactly the pairs of a direct per-pair computation over the
  * SAME df-capped trigram feature space — the distribution strategy is
  * a cost choice, never a result choice. The df cap itself is part of
  * the operator's definition (rare-feature weighting), so the
  * reference computation applies it too.
  */
class SparseCosineSpec extends SparkSpec {

  test("postings-join sparse cosine == direct per-pair computation") {
    val got = graft.SparkEntry.queries("q_dedup_sparse_cosine")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

    // reference: per-doc capped trigram tf vectors, all-pairs cosine
    // (driver-side — sf0.001 is fixture-sized)
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val grams: Map[Long, Map[String, Long]] = docs.map { case (id, text) =>
      val tk = text.split(" ", -1)
      val gs = tk.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      id -> gs.groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    }.toMap
    val df = grams.values.flatMap(_.keys).groupBy(identity)
      .map { case (g, o) => g -> o.size }
    val kept: Map[Long, Map[String, Long]] =
      grams.map { case (id, v) => id -> v.filter { case (g, _) => df(g) <= 50 } }
    val ids = docs.map(_._1).sorted
    val expected = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      a = kept(ids(i)); b = kept(ids(j))
      dot = a.keysIterator.filter(b.contains).map(g => a(g) * b(g)).sum
      na2 = a.valuesIterator.map(v => v * v).sum
      nb2 = b.valuesIterator.map(v => v * v).sum
      if dot * dot * 25 >= 16 * na2 * nb2 && dot > 0
    } yield (ids(i), ids(j)) -> ((dot, na2, nb2))).toMap

    assert(expected.nonEmpty, "fixture corpus yields no cosine pairs")
    assert(got === expected)
  }
}
