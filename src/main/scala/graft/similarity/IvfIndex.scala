package graft.similarity

import graft.functions.CosineSimilarity.cosine_sim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF (inverted-file) approximate nearest-neighbor index over an
  * embedding column — the production scale path for similarity search:
  * train K spherical-k-means centroids, assign every vector to its
  * nearest centroid (the "inverted list"), then search only the nProbe
  * nearest lists per query instead of the full corpus.
  *
  * Distributed shape: per-iteration state is ONLY the centroid table
  * (K x dim floats — kilobytes at any corpus size), which is collected
  * to the driver and re-broadcast each Lloyd iteration; every
  * assignment pass is a broadcast join + codegen'd cosine over the full
  * corpus, so the heavy side never shuffles. Search scans 1/K * nProbe
  * of the data per query.
  *
  * Determinism: centroids initialize from the K lowest vec_ids (no
  * RNG), ties in assignment break by centroid id — results are stable
  * run-to-run, and searching with nProbe = K degrades gracefully to
  * EXACT brute force (the property the spec exploits).
  */
object IvfIndex {

  /** (centroid_id: Int, cv: Array[Float]) after `iters` Lloyd rounds. */
  def train(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = embeddings.sparkSession
    var centroids = embeddings
      .orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("embedding"))
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }

    for (_ <- 0 until iters) {
      val cDf = centroidFrame(spark, centroids)
      val assigned = assign(embeddings, cDf)
      // new centroid j = element-wise mean of its members
      val means = embeddings.join(assigned, "vec_id")
        .select(col("centroid_id"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("centroid_id", "pos")
        .agg(avg(col("v")).as("m"))
        .groupBy("centroid_id")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m").cast(FloatType)).as("cv"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      // empty clusters keep their previous centroid
      val byId = means.toMap
      centroids = centroids.map { case (i, old) => (i, byId.getOrElse(i, old)) }
    }
    centroidFrame(spark, centroids)
  }

  /** Nearest-centroid assignment: (vec_id, centroid_id). */
  def assign(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("vec_id")
      .orderBy(desc("sim"), asc("centroid_id"))
    embeddings.crossJoin(broadcast(centroids))
      .withColumn("sim", cosine_sim(col("embedding"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"))
  }

  /** Top-k cosine neighbors per query, probing the nProbe nearest
    * inverted lists. queries: (query_id, qv). */
  def search(embeddings: DataFrame, assignments: DataFrame,
             centroids: DataFrame, queries: DataFrame,
             topK: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy("query_id")
      .orderBy(desc("csim"), asc("centroid_id"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("csim", cosine_sim(col("qv"), col("cv")))
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id"))
    val wq = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("vec_id"))
    embeddings.join(assignments, "vec_id")
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine_sim(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("sim"))
  }

  private def centroidFrame(
      spark: SparkSession, cs: Array[(Int, Array[Float])]): DataFrame = {
    import spark.implicits._
    cs.toSeq.toDF("centroid_id", "cv")
  }
}
