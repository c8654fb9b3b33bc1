package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PngCodecSpec extends SparkSpec {
  import spark.implicits._

  // a real-world 1x1 RGBA PNG (the canonical transparent pixel),
  // produced by an actual encoder — NOT by our writer
  private val onePixel = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk" +
      "+M9QDwADhgGAWjR9awAAAABJRU5ErkJggg==")

  test("parses a real encoder's PNG header") {
    val info = PngCodec.parse(42L, onePixel)
    assert(info.width === 1L)
    assert(info.height === 1L)
    assert(info.bit_depth === 8)
    assert(info.color_type === 6) // RGBA
    assert(info.idat_bytes === 13L)
    assert(info.n_chunks === 3L) // IHDR, IDAT, IEND
  }

  test("rejects malformed payloads without throwing") {
    assert(PngCodec.parseOption(1L, Array[Byte]()) === None)
    assert(PngCodec.parseOption(1L, "not a png at all, just text"
      .getBytes("UTF-8")) === None)
    // valid signature, truncated mid-IHDR
    assert(PngCodec.parseOption(1L, onePixel.take(20)) === None)
    // chunk length pointing past the buffer
    val lied = onePixel.clone(); lied(11) = 99.toByte
    assert(PngCodec.parseOption(1L, lied) === None)
  }

  test("synthetic writer and parser roundtrip through the seam") {
    val docs = Seq(
      (1L, "alpha beta gamma", 16L),
      (2L, "", 0L),
      (3L, "x" * 1000, 1000L)
    ).toDF("doc_id", "text", "n_chars")
    val got = PngCodec.decode(
        PngCodec.syntheticPngs(docs).as[PngCodec.PngRow])
      .collect().map(i => i.media_id -> i).toMap
    assert(got.size === 3)
    for ((id, text, n) <- Seq((1L, "alpha beta gamma", 16L), (2L, "", 0L),
        (3L, "x" * 1000, 1000L))) {
      val i = got(id)
      assert(i.width === n % 640 + 16)
      assert(i.height === n % 480 + 8)
      assert(i.bit_depth === 8)
      assert(i.color_type === (if (id % 2 == 0) 6 else 2))
      assert(i.idat_bytes === text.length.toLong)
      assert(i.n_chunks === 3L)
    }
  }

  test("zlib pixel decode round-trips exactly; corruption is rejected") {
    import spark.implicits._
    val src = Seq((9L, "hello png pixels"), (10L, "")).toDS()
    val rows = PngCodec.syntheticCompressedPngs(src)
    val stats = PngCodec.decodePixels(rows).collect()
      .map(s => s.media_id -> s).toMap
    val bytes = "hello png pixels".getBytes("UTF-8").map(_ & 0xff)
    val s9 = stats(9L)
    assert(s9.width === 32 && s9.height === 1 && s9.n_pixels === 32)
    assert(s9.sum_lum === bytes.map(_.toLong).sum)
    assert(s9.peak === bytes.max.toLong)
    assert(s9.mean_milli === 1000L * bytes.map(_.toLong).sum / 32)
    // empty doc: one zero-padded scanline
    assert(stats(10L) === PngCodec.PixelStats(10L, 32, 1, 32, 0, 0, 0))
    // corrupt one IDAT byte -> inflate fails -> row dropped, no throw
    val corrupted = rows.collect().map { r =>
      val b = r.payload.clone()
      b(8 + 25 + 8 + 4) = (b(8 + 25 + 8 + 4) ^ 0x55).toByte
      PngCodec.PngRow(r.media_id, b)
    }.toSeq.toDS()
    assert(PngCodec.decodePixels(corrupted).count() === 0)
  }

  test("synthetic payloads are byte-valid PNGs (signature + framing)") {
    val docs = Seq((7L, "hello png", 9L)).toDF("doc_id", "text", "n_chars")
    val payload = PngCodec.syntheticPngs(docs)
      .select(col("payload")).head().getAs[Array[Byte]](0)
    assert(payload.take(8).toSeq === PngCodec.Signature.toSeq)
    assert(new String(payload, 12, 4, "US-ASCII") === "IHDR")
    // total size: 8 sig + 25 IHDR + (12 + 9) IDAT + 12 IEND
    assert(payload.length === 8 + 25 + 21 + 12)
    assert(new String(payload, payload.length - 8, 4, "US-ASCII") === "IEND")
  }
}
