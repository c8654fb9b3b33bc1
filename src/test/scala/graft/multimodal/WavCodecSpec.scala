package graft.multimodal

import graft.{SparkSpec, Tables}

/** WavCodec: golden-byte parse, RIFF pad-byte walking, malformed
  * rejection, and the synthetic writer/parser roundtrip through the
  * partition-wise seam. */
class WavCodecSpec extends SparkSpec {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def wav(channels: Int, rate: Int, data: Array[Byte],
                  extra: Option[(String, Array[Byte])] = None): Array[Byte] = {
    val fmt = le16(1) ++ le16(channels) ++ le32(rate) ++
      le32(rate.toLong * channels * 2) ++ le16(channels * 2) ++ le16(16)
    val chunks = ("fmt ".getBytes("US-ASCII") ++ le32(16) ++ fmt) ++
      extra.map { case (t, d) =>
        t.getBytes("US-ASCII") ++ le32(d.length.toLong) ++ d ++
          (if (d.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
      }.getOrElse(Array.empty[Byte]) ++
      ("data".getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data)
    "RIFF".getBytes("US-ASCII") ++ le32(4L + chunks.length) ++
      "WAVE".getBytes("US-ASCII") ++ chunks
  }

  test("features: sign extension, peak, and exact milli mean") {
    import spark.implicits._
    // samples: +1, -1 (0xFFFF), -32768 (0x0080 LE => 0x8000), +258
    val data = le16(1) ++ le16(0xFFFF) ++ le16(0x8000) ++ le16(258)
    val rows = Seq(WavCodec.WavRow(3L, wav(1, 8000, data))).toDS()
    val f = WavCodec.features(rows).collect().head
    // |1| + |-1| + |-32768| + |258| = 33028
    assert(f === WavCodec.WavFeatures(3L, 4L, 33028L, 32768L,
      1000L * 33028 / 4))
  }

  test("features: empty data chunk yields zeroed stats, not a crash") {
    import spark.implicits._
    val rows = Seq(WavCodec.WavRow(4L,
      wav(1, 8000, Array.empty[Byte]))).toDS()
    val f = WavCodec.features(rows).collect().head
    assert(f === WavCodec.WavFeatures(4L, 0L, 0L, 0L, 0L))
  }

  test("golden parse: hand-built stereo 16kHz WAV") {
    val data = Array.tabulate(64)(_.toByte) // 16 stereo 16-bit frames
    val info = WavCodec.parse(7L, wav(2, 16000, data))
    assert(info === WavCodec.WavInfo(7L, 2, 16000L, 16, 64L, 16L,
      16L * 1000 / 16000, 2L))
  }

  test("odd-size chunk is walked with its RIFF pad byte") {
    // a 3-byte LIST chunk between fmt and data forces the pad-byte
    // path: without the (len & 1) advance the walker desyncs and the
    // data chunk is never found
    val info = WavCodec.parse(1L, wav(1, 8000,
      Array.tabulate(10)(_.toByte), extra = Some(("LIST", Array[Byte](1, 2, 3)))))
    assert(info.n_chunks === 3 && info.data_bytes === 10 &&
      info.n_samples === 5)
  }

  test("malformed payloads are rejected without throwing") {
    assert(WavCodec.parseOption(1L, Array[Byte](1, 2, 3)).isEmpty)
    assert(WavCodec.parseOption(1L,
      "JUNK".getBytes ++ new Array[Byte](40)).isEmpty)
    // valid magic, truncated data chunk
    val good = wav(1, 8000, Array.tabulate(10)(_.toByte))
    assert(WavCodec.parseOption(1L, good.dropRight(4)).isEmpty)
    // non-PCM audio_format
    val nonPcm = good.clone()
    nonPcm(20) = 3 // audio_format low byte inside fmt data
    assert(WavCodec.parseOption(1L, nonPcm).isEmpty)
  }

  test("synthetic writer and parser roundtrip through the seam") {
    import spark.implicits._
    val wavs = WavCodec.syntheticWavs(Tables.load(spark, sf0001, "documents"))
      .as[WavCodec.WavRow]
    val infos = WavCodec.decode(wavs).collect()
    assert(infos.nonEmpty)
    infos.foreach { i =>
      assert(i.channels == 1 + (i.media_id % 2).toInt)
      assert(i.sample_rate == 8000 + (i.media_id % 4) * 4000)
      assert(i.bits_per_sample == 16)
      assert(i.data_bytes % (i.channels * 2) == 0)
      assert(i.n_samples == i.data_bytes / (i.channels * 2))
      assert(i.n_chunks == 2)
    }
  }
}
