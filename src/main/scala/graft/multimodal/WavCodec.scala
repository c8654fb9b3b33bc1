package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The AUDIO sibling of [[PngCodec]]: a real WAV/RIFF parser behind the
  * same partition-wise codec seam — image (PNG), video-style access
  * (frame sampling) and audio (this) all exercise the one multimodal
  * plumbing path with genuine formats.
  *
  * RIFF/WAVE layout (little-endian throughout, the opposite of PNG's
  * big-endian framing — parsing both under one gate pins the
  * endianness handling): `"RIFF" | riff_size(u32 LE) | "WAVE"`, then
  * sub-chunks of `id(4 ASCII) | size(u32 LE) | data(size)`, each
  * padded to an even offset per the RIFF word-alignment rule. The
  * `fmt ` chunk (16 bytes for PCM) holds audio_format(u16),
  * channels(u16), sample_rate(u32), byte_rate(u32), block_align(u16),
  * bits_per_sample(u16); the `data` chunk holds the samples.
  *
  * [[parse]] validates the magic + PCM fmt framing, walks the chunk
  * list (honoring odd-size pad bytes), and derives the stream stats a
  * training pipeline triages on: sample count (data bytes over block
  * align) and integer-exact duration_ms — the header pass an audio
  * loader runs before any resample/decode stage.
  */
object WavCodec {

  /** Parsed header + stream stats for one WAV payload. */
  case class WavInfo(media_id: Long, channels: Int, sample_rate: Long,
                     bits_per_sample: Int, data_bytes: Long,
                     n_samples: Long, duration_ms: Long, n_chunks: Long)

  case class WavRow(media_id: Long, payload: Array[Byte])

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Strict parse; throws on malformed payloads (bad magic, non-PCM,
    * truncated chunk, missing fmt/data). [[parseOption]] triages. */
  def parse(mediaId: Long, b: Array[Byte]): WavInfo = {
    require(b.length >= 44, s"payload too short for a WAV: ${b.length}")
    require(tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE", "bad RIFF/WAVE magic")
    var off = 12L
    var nChunks = 0L
    var dataBytes = -1L
    var channels = -1
    var sampleRate = -1L
    var blockAlign = -1
    var bits = -1
    while (off + 8 <= b.length) {
      val t = tag(b, off.toInt)
      val len = le32(b, off.toInt + 4)
      require(off + 8 + len <= b.length, s"truncated $t chunk at $off")
      if (t == "fmt ") {
        require(len >= 16, s"fmt chunk too short: $len")
        val o = off.toInt + 8
        require(le16(b, o) == 1, "not PCM (audio_format != 1)")
        channels = le16(b, o + 2)
        sampleRate = le32(b, o + 4)
        blockAlign = le16(b, o + 12)
        bits = le16(b, o + 14)
      }
      if (t == "data") dataBytes = len
      nChunks += 1
      off += 8 + len + (len & 1) // RIFF pads odd chunks to even offsets
    }
    require(channels > 0 && sampleRate > 0 && blockAlign > 0,
      "no valid fmt chunk")
    require(dataBytes >= 0, "no data chunk")
    val nSamples = dataBytes / blockAlign
    WavInfo(mediaId, channels, sampleRate, bits, dataBytes, nSamples,
      nSamples * 1000L / sampleRate, nChunks)
  }

  def parseOption(mediaId: Long, b: Array[Byte]): Option[WavInfo] =
    try Some(parse(mediaId, b)) catch { case _: IllegalArgumentException => None }

  /** Same partition-wise seam as PngCodec.decode / StubCodec. */
  def decode(rows: Dataset[WavRow]): Dataset[WavInfo] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.flatMap(r => parseOption(r.media_id, r.payload)))
  }

  case class WavFeatures(media_id: Long, n_points: Long, sum_abs: Long,
                         peak: Long, mean_milli: Long)

  /** 16-bit LE PCM feature pass over the data chunk — the audio
    * analog of PngCodec's pixel stats: per file, the count of sample
    * points (channels interleaved, counted individually), the L1
    * energy Σ|s|, the peak |s|, and the exact mean in millis
    * (1000·Σ|s| div n). One sequential walk per payload at the codec
    * seam; every number is an exact integer, so the DuckDB oracle
    * recomputes the identical values from the synthetic payload's
    * source bytes. */
  def features(rows: Dataset[WavRow]): Dataset[WavFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.flatMap { r =>
      parseOption(r.media_id, r.payload).map { info =>
        // locate the data chunk again (payload walk, same rules)
        val b = r.payload
        var off = 12L
        var dataOff = -1L
        var dataLen = 0L
        while (off + 8 <= b.length && dataOff < 0) {
          val t = tag(b, off.toInt)
          val len = le32(b, off.toInt + 4)
          if (t == "data") { dataOff = off + 8; dataLen = len }
          off += 8 + len + (len & 1)
        }
        var i = 0L
        var sumAbs = 0L
        var peak = 0L
        val nPoints = dataLen / 2
        while (i < nPoints) {
          val o = (dataOff + 2 * i).toInt
          val raw = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
          val s = if (raw >= 0x8000) raw - 0x10000 else raw
          val a = math.abs(s).toLong
          sumAbs += a
          if (a > peak) peak = a
          i += 1
        }
        WavFeatures(r.media_id, nPoints, sumAbs, peak,
          if (nPoints > 0) 1000L * sumAbs / nPoints else 0L)
      }
    })
  }

  // little-endian field writers (hex emits big-endian; swap byte pairs)
  private def le32w(c: Column): Column = {
    val h = lpad(hex(c), 8, "0")
    unhex(concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2)))
  }
  private def le16w(c: Column): Column = {
    val h = lpad(hex(c), 4, "0")
    unhex(concat(substring(h, 3, 2), substring(h, 1, 2)))
  }

  /** Synthesize a VALID PCM WAV per document with Catalyst binary
    * expressions — fmt fields derive from doc metadata, text bytes
    * (truncated to a whole number of sample frames) stand in for the
    * PCM stream. As with [[PngCodec.syntheticPngs]], the oracle
    * recomputes every parsed field independently from the doc columns,
    * so a wrong offset or a big/little-endian mixup in EITHER the
    * writer or [[parse]] breaks the hash gate. */
  def syntheticWavs(docs: DataFrame): DataFrame = {
    val channels = lit(1) + col("doc_id") % 2
    val sampleRate = lit(8000) + (col("doc_id") % 4) * 4000
    val blockAlign = channels * 2 // 16-bit PCM
    val byteRate = sampleRate * blockAlign
    val rawLen = octet_length(col("text")).cast("long")
    val dataLen = rawLen - rawLen % blockAlign // whole sample frames
    docs.select(
      col("doc_id").as("media_id"),
      concat(
        lit("RIFF".getBytes("US-ASCII")),
        le32w(dataLen + 36), // 4 ("WAVE") + 24 (fmt) + 8 (data hdr)
        lit("WAVE".getBytes("US-ASCII")),
        lit("fmt ".getBytes("US-ASCII")), le32w(lit(16)),
        le16w(lit(1)), le16w(channels), le32w(sampleRate),
        le32w(byteRate), le16w(blockAlign), le16w(lit(16)),
        lit("data".getBytes("US-ASCII")), le32w(dataLen),
        encode(col("text"), "UTF-8").substr(lit(1), dataLen.cast("int"))
      ).as("payload"))
  }
}
