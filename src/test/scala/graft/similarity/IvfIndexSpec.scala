package graft.similarity

import graft.SparkSpec
import graft.functions.CosineSimilarity.cosine_sim
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()
  lazy val centroids = IvfIndex.train(emb, k = 8, iters = 2).cache()
  lazy val assignments = IvfIndex.assign(emb, centroids).cache()
  lazy val queries = emb.filter(col("vec_id") < 3)
    .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  test("train yields k centroids of the right dimension") {
    val rows = centroids.collect()
    assert(rows.length === 8)
    rows.foreach(r => assert(r.getSeq[Float](1).length === 64))
  }

  test("every vector is assigned to exactly one centroid") {
    assert(assignments.count() === emb.count())
    assert(assignments.select("vec_id").distinct().count() === emb.count())
    assert(assignments.select("centroid_id").distinct().count() <= 8)
  }

  test("assignment is the argmax-cosine centroid (spot check)") {
    val cs = centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val some = emb.filter(col("vec_id") < 10)
      .join(assignments, "vec_id")
      .select("vec_id", "embedding", "centroid_id").collect()
    some.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val best = cs.map { case (cid, cv) => (cid, cosLocal(v, cv)) }
        .maxBy { case (cid, s) => (s, -cid) }._1
      assert(r.getInt(2) === best, s"vec ${r.getLong(0)}")
    }
  }

  test("nProbe = k degrades to exact brute force") {
    val ivf = IvfIndex.search(emb, assignments, centroids, queries,
      topK = 10, nProbe = 8)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    val brute = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"))
      .join(broadcast(queries), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine_sim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    assert(ivf === brute)
  }

  test("assign is map-only: no Window, no Sort, no Exchange") {
    val plan = IvfIndex.assign(emb, centroids)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("large-K join fallback agrees with the inline argmax path") {
    val inline = assignments.collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val joined = IvfIndex.assignViaJoin(emb, centroids).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(inline === joined)
  }

  test("buildIndex persists co-located lists; searchIndexed ≡ search") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx")
      .resolve("index").toString
    IvfIndex.buildIndex(emb, centroids, dir)
    // layout: one directory per inverted list (hive-style partition)
    val subdirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(subdirs.nonEmpty && subdirs.forall(_.startsWith("centroid_id=")))
    assert(subdirs.length.toLong ===
      assignments.select("centroid_id").distinct().count())

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaIndex = rows(
      IvfIndex.searchIndexed(spark, dir, centroids, queries, 5, 2))
    val direct = rows(
      IvfIndex.search(emb, assignments, centroids, queries, 5, 2))
    assert(viaIndex === direct)
    assert(viaIndex.nonEmpty)

    // the layout supports static partition pruning: restricting to two
    // lists must SCAN strictly fewer files than the full index. (Note
    // df.inputFiles ignores filters — it lists the whole relation — so
    // the probative check is the scan node's numFiles metric after an
    // actual execution, plus the partition filter in the plan.)
    val probedTwo = subdirs.take(2).map(_.split("=")(1).toInt).toSeq
    def filesScanned(df: org.apache.spark.sql.DataFrame): Long = {
      val proj = df.select("vec_id") // scan-only plan: no exchange/AQE
      proj.collect()
      proj.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    val full = spark.read.parquet(dir)
    val pruned = full.filter(col("centroid_id").isin(probedTwo: _*))
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [centroid_id"), "no partition filter in plan")
    val (prunedFiles, fullFiles) = (filesScanned(pruned), filesScanned(full))
    assert(prunedFiles < fullFiles, s"pruned=$prunedFiles full=$fullFiles")
    assert(prunedFiles > 0L)
  }

  test("search is deterministic across runs") {
    def run() = IvfIndex.search(emb, assignments, centroids, queries, 5, 2)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(run() === run())
  }

  private def cosLocal(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }
}
