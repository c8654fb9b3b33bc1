package graft.similarity

import graft.Tables
import graft.functions.GraftFunctions._
import graft.queries.CoreQueries.Q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity-search operators over the `embeddings` table
  * (vec_id, embedding: array<float> dim 64, label).
  *
  * Cosine is computed with exact decimal dot products (GraftFunctions
  * .cosineDecimal): element-wise products in DECIMAL(10,6) summed
  * exactly, final division/sqrt in IEEE double — bitwise identical in
  * any engine, independent of partitioning/accumulation order. That is
  * what makes a float-heavy operator ORACLE-VERIFIABLE at all.
  *
  * Scale path: brute force is the correctness baseline (still fully
  * distributed: broadcast the query set, scan+topK per partition via
  * TakeOrderedAndProject). The bucketed variant prunes candidates by a
  * partition key (label here; IVF centroid id in production) — same
  * plan shape, 1/K the scan per query.
  */
object SimilarityQueries {

  private val NearDupThreshold = 0.4 // data max ~0.51; away from edges

  val all: Seq[Q] = Seq(

    // brute-force exact top-10 cosine neighbors for 5 query vectors;
    // the query side is tiny -> broadcast, no shuffle of the big side
    Q("q_ann_bruteforce",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.load(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val c = e.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cv"))
        val w = Window.partitionBy("query_id")
          .orderBy(desc("cos"), asc("neighbor_id"))
        c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
          .withColumn("cos", cosineDecimal(col("qv"), col("cv")))
          .withColumn("rank", row_number().over(w).cast(LongType))
          .filter(col("rank") <= 10)
          .select("query_id", "neighbor_id", "rank", "cos")
          .orderBy("query_id", "rank")
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
             |  WHERE vec_id < 5),
             |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
             |s AS (
             |  SELECT query_id, neighbor_id,
             |    CAST(list_sum(list_transform(range(1, 65),
             |      i -> CAST(CAST(qv[i] AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(cv[i] AS DOUBLE) AS DECIMAL(10,6)))) AS DOUBLE)
             |    / sqrt(
             |      CAST(list_sum(list_transform(range(1, 65),
             |        i -> CAST(CAST(qv[i] AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(qv[i] AS DOUBLE) AS DECIMAL(10,6)))) AS DOUBLE) *
             |      CAST(list_sum(list_transform(range(1, 65),
             |        i -> CAST(CAST(cv[i] AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(cv[i] AS DOUBLE) AS DECIMAL(10,6)))) AS DOUBLE)
             |    ) AS cos
             |  FROM c JOIN q ON neighbor_id <> query_id),
             |r AS (
             |  SELECT query_id, neighbor_id, cos,
             |    CAST(row_number() OVER (PARTITION BY query_id
             |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
             |  FROM s)
             |SELECT query_id, neighbor_id, rank, cos FROM r
             |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // bucketed ANN (IVF-style): candidates restricted to the query's
    // bucket — here the label column stands in for a centroid
    // assignment; the plan shape (bucket equi-join prunes the scan) is
    // the 100 TB path
    Q("q_ann_bucketed",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.load(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("label").as("qlabel"))
        val c = e.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cv"), col("label"))
        val w = Window.partitionBy("query_id")
          .orderBy(desc("cos"), asc("neighbor_id"))
        c.join(broadcast(q),
            col("label") === col("qlabel") &&
            col("neighbor_id") =!= col("query_id"))
          .withColumn("cos", cosineDecimal(col("qv"), col("cv")))
          .withColumn("rank", row_number().over(w).cast(LongType))
          .filter(col("rank") <= 5)
          .select("query_id", "neighbor_id", "rank", "cos")
          .orderBy("query_id", "rank")
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
             |  FROM embeddings WHERE vec_id < 5),
             |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label
             |  FROM embeddings),
             |s AS (
             |  SELECT query_id, neighbor_id,
             |    CAST(list_sum(list_transform(range(1, 65),
             |      i -> CAST(CAST(qv[i] AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(cv[i] AS DOUBLE) AS DECIMAL(10,6)))) AS DOUBLE)
             |    / sqrt(
             |      CAST(list_sum(list_transform(range(1, 65),
             |        i -> CAST(CAST(qv[i] AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(qv[i] AS DOUBLE) AS DECIMAL(10,6)))) AS DOUBLE) *
             |      CAST(list_sum(list_transform(range(1, 65),
             |        i -> CAST(CAST(cv[i] AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(cv[i] AS DOUBLE) AS DECIMAL(10,6)))) AS DOUBLE)
             |    ) AS cos
             |  FROM c JOIN q ON label = qlabel AND neighbor_id <> query_id),
             |r AS (
             |  SELECT query_id, neighbor_id, cos,
             |    CAST(row_number() OVER (PARTITION BY query_id
             |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
             |  FROM s)
             |SELECT query_id, neighbor_id, rank, cos FROM r
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // embedding-cosine near-duplicate pairs above a threshold, blocked
    // by label (the candidate-pruning key at scale)
    Q("q_dedup_embedding",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val a = e.select(col("label"), col("vec_id").as("a_id"),
          col("embedding").as("a_v"))
        val b = e.select(col("label"), col("vec_id").as("b_id"),
          col("embedding").as("b_v"))
        a.join(b, Seq("label"))
          .filter(col("a_id") < col("b_id"))
          .withColumn("cos", cosineDecimal(col("a_v"), col("b_v")))
          .filter(col("cos") >= NearDupThreshold)
          .select("a_id", "b_id", "cos")
          .orderBy("a_id", "b_id")
      },
      Some(s"""WITH s AS (
             |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |    CAST(list_sum(list_transform(range(1, 65),
             |      i -> CAST(CAST(a.embedding[i] AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(b.embedding[i] AS DOUBLE) AS DECIMAL(10,6)))) AS DOUBLE)
             |    / sqrt(
             |      CAST(list_sum(list_transform(range(1, 65),
             |        i -> CAST(CAST(a.embedding[i] AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(a.embedding[i] AS DOUBLE) AS DECIMAL(10,6)))) AS DOUBLE) *
             |      CAST(list_sum(list_transform(range(1, 65),
             |        i -> CAST(CAST(b.embedding[i] AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(b.embedding[i] AS DOUBLE) AS DECIMAL(10,6)))) AS DOUBLE)
             |    ) AS cos
             |  FROM embeddings a JOIN embeddings b
             |    ON a.label = b.label AND a.vec_id < b.vec_id)
             |SELECT a_id, b_id, cos FROM s WHERE cos >= $NearDupThreshold
             |ORDER BY a_id, b_id""".stripMargin))
  )
}
