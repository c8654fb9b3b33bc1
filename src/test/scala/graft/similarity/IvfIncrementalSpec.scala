package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental IVF maintenance (IvfIndex.extendIndex): growing the
  * index assigns ONLY the new vectors against the frozen centroids,
  * appends new files, NEVER touches an existing index file — and the
  * grown index is row-identical to a full rebuild over the union, so
  * every search answer is unchanged. */
class IvfIncrementalSpec extends SparkSpec {

  private lazy val emb = graft.Tables
    .load(spark, sf0001, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private lazy val centroids = IvfIndex.train(emb, k = 8, iters = 0)

  private def fileMap(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> (f.length(), f.lastModified()))
      .toMap
  }

  test("extendIndex appends new files only, equals the full rebuild, " +
    "and search answers are unchanged") {
    val part1 = emb.filter(col("vec_id") % 3 =!= 2)
    val part2 = emb.filter(col("vec_id") % 3 === 2)
    val incDir = graft.Tables.matDir(
      s"ivf_inc_${System.nanoTime}", spark, sf0001)
    IvfIndex.buildIndex(part1, centroids, incDir)
    val before = fileMap(incDir)
    IvfIndex.extendIndex(part2, centroids, incDir)
    val after = fileMap(incDir)
    // incremental maintenance never touches an existing index file
    assert(before.keySet.subsetOf(after.keySet),
      "extend must not delete index files")
    assert(before.forall { case (p, sig) => after(p) == sig },
      "extend must not rewrite an existing index file")
    // its cost is the NEW vectors: appended rows == |part2|
    val newFiles = (after.keySet -- before.keySet).toSeq
    assert(newFiles.nonEmpty)
    assert(spark.read.parquet(incDir).count() === emb.count())
    // row-identical to the full rebuild (frozen centroids,
    // deterministic assignment)
    val fullDir = graft.Tables.matDir(
      s"ivf_full_${System.nanoTime}", spark, sf0001)
    IvfIndex.buildIndex(emb, centroids, fullDir)
    def canonIdx(dir: String) = spark.read.parquet(dir)
      .select("vec_id", "centroid_id")
      .orderBy("vec_id").collect().map(_.toSeq)
    assert(canonIdx(incDir) === canonIdx(fullDir))
    // and search through the grown index equals the rebuilt one
    val qs = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    def run(dir: String) = IvfIndex.searchIndexed(spark, dir,
      centroids, qs, topK = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(run(incDir) === run(fullDir))
  }
}
