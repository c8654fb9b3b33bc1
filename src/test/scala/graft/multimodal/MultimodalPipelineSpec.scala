package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MultimodalPipeline._
import org.apache.spark.sql.functions._

class MultimodalPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("end-to-end: documents -> media -> features, one row per doc") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val feats = MultimodalPipeline.run(spark, sf0001).cache()
    assert(feats.count() === docs)
    assert(feats.columns.toSet === Set("media_id", "kind", "n_bytes",
      "sha_head", "mean_byte", "n_frames", "feature"))
  }

  test("features are deterministic across runs (stub codec is pure)") {
    val a = MultimodalPipeline.run(spark, sf0001)
      .orderBy("media_id").collect()
    val b = MultimodalPipeline.run(spark, sf0001)
      .orderBy("media_id").collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("histogram feature sums to ~1 and n_frames matches payload size") {
    val rows = MultimodalPipeline.run(spark, sf0001)
      .select("n_bytes", "n_frames", "feature").collect()
    rows.foreach { r =>
      val n = r.getLong(0)
      val frames = r.getInt(1)
      val feat = r.getSeq[Float](2)
      assert(frames === ((n + StubCodec.FrameBytes - 1) / StubCodec.FrameBytes).toInt)
      assert(math.abs(feat.sum - 1.0f) < 1e-3)
    }
  }

  test("decode parallelism tracks the cluster, not a literal") {
    val media = mediaFromDocuments(spark, sf0001)
    assert(media.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
  }

  test("empty payload is handled (no div-by-zero, zero frames)") {
    val one = Seq(MediaRow(1L, "image", Array.emptyByteArray, 0, 0, 0)).toDS()
    val f = decodeAndExtract(one).collect().head
    assert(f.n_frames === 0 && f.mean_byte === 0.0 && f.n_bytes === 0L)
  }
}
