package graft.similarity

import graft.SparkSpec

class QuantizedAnnSpec extends SparkSpec {

  private def top10(name: String): Map[Long, Seq[Long]] =
    SimilarityQueries.all.find(_.name == name).get.fn(spark, sf0001)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(_._3).map(_._2).toSeq }

  test("quantized top-10 has high recall vs the exact ranking") {
    val exact = top10("q_ann_bruteforce")
    val quant = top10("q_ann_quantized")
    assert(quant.keySet === exact.keySet)
    val recalls = exact.keys.toSeq.map { q =>
      quant(q).toSet.intersect(exact(q).toSet).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    // int8 keeps ~7 bits of precision per component; on the 64-dim test
    // embeddings the quantized ordering should recover most of the
    // exact top-10 (deterministic: fixed data, exact integer scoring)
    assert(mean >= 0.8, s"mean recall@10 = $mean, per-query: $recalls")
  }

  test("quantized scores stay in [-1, 1] and ranks are 1..10 per query") {
    val rows = SimilarityQueries.all.find(_.name == "q_ann_quantized").get
      .fn(spark, sf0001).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-12)
    }
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.map(_.getLong(2)).sorted.toSeq === (1L to 10L))
    }
  }
}
