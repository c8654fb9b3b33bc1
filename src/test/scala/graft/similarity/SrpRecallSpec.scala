package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_ann_srp quality gate: the hyperplane-LSH candidate set must
  * recover most of the EXACT top-5 (computed by q_ann_bruteforce's
  * full scan) — the sketch is a pruner, not an answer-changer, and
  * this pins how much recall the hamming<=28 cut buys on real data. */
class SrpRecallSpec extends SparkSpec {

  test("SRP top-5 recall@5 vs exact brute force >= 0.6") {
    def top5(name: String): Map[Long, Set[Long]] =
      graft.SparkEntry.queries(name)(spark, sf0001)
        .filter(col("rank") <= 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val exact = top5("q_ann_bruteforce")
    val srp = top5("q_ann_srp")
    assert(exact.nonEmpty)
    val recalls = exact.map { case (q, ex) =>
      val got = srp.getOrElse(q, Set.empty)
      ex.intersect(got).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(f"SRP recall@5 per query: ${recalls.map(r => f"$r%.1f").mkString(", ")} (mean $mean%.2f)")
    assert(mean >= 0.6, f"mean SRP recall@5 $mean%.2f below 0.6")
  }
}
