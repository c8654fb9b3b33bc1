package graft.similarity

import graft.SparkSpec
import graft.functions.CosineSimilarity.cosine_sim
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("top-3 per group matches a sort-based reference") {
    val data = (1L to 100L).map(i => (i % 5, ScoredId(i, (i * 37 % 100) / 10.0)))
    val ds = data.toDS()
    val agg = new TopKAggregator(3).toColumn
    val got = ds.groupByKey(_._1).mapValues(_._2).agg(agg)
      .collect().toMap
    val expected = data.groupBy(_._1).map { case (g, rows) =>
      g -> rows.map(_._2).sortBy(s => (-s.score, s.id)).take(3).toList
    }
    expected.foreach { case (g, exp) => assert(got(g) === exp, s"group $g") }
  }

  test("ANN via TopKAggregator agrees with the window-based battery query") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val pairs = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"),
        col("neighbor_id").as("id"),
        cosine_sim(col("qv"), col("cv")).as("score"))
    val topAgg = pairs.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => ScoredId(r._2, r._3))
      .agg(new TopKAggregator(5).toColumn)
      .collect().toMap

    // reference: window row_number
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("id"))
    val ref = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("query_id", "id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toList }

    ref.foreach { case (qid, ids) =>
      assert(topAgg(qid).map(_.id) === ids, s"query $qid")
    }
  }
}
