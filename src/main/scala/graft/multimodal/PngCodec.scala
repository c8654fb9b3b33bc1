package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A REAL format parser behind the multimodal codec seam: PNG.
  *
  * PNG (RFC 2083 / ISO 15948) is fixed-layout enough to parse with no
  * library: an 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then a
  * sequence of chunks, each `length(4, big-endian) | type(4, ASCII) |
  * data(length) | crc(4)`. The first chunk is always IHDR with 13 data
  * bytes: width (u32 BE, payload offset 16), height (u32 BE, offset
  * 20), bit depth (offset 24), color type (offset 25). Pixel data
  * lives in one or more IDAT chunks; IEND terminates the stream.
  *
  * [[parse]] validates the signature and the IHDR framing, reads the
  * header fields from their fixed offsets, then WALKS the chunk list
  * (offset += 12 + length) counting chunks and summing IDAT payload
  * bytes — the same loop a thumbnailer runs before handing bytes to a
  * decompressor. CRCs are carried, not validated (header triage never
  * inflates or checksums; a decode stage would).
  *
  * This runs through the identical partition-wise seam as
  * [[MultimodalPipeline.decodeAndExtract]] (mapPartitions, per-partition
  * setup amortized, rows streamed) — proving the seam with a real
  * format where StubCodec proves it with a fake one.
  */
object PngCodec {

  val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parsed header + stream stats for one PNG payload. */
  case class PngInfo(media_id: Long, width: Long, height: Long,
                     bit_depth: Int, color_type: Int,
                     idat_bytes: Long, n_chunks: Long)

  case class PngRow(media_id: Long, payload: Array[Byte])

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Strict parse; throws on a malformed payload (bad signature, bad
    * IHDR framing, truncated chunk). Use [[parseOption]] to triage
    * mixed corpora. */
  def parse(mediaId: Long, b: Array[Byte]): PngInfo = {
    require(b.length >= 33, s"payload too short for a PNG: ${b.length}")
    require(Signature.indices.forall(i => b(i) == Signature(i)),
      "bad PNG signature")
    require(be32(b, 8) == 13 && tag(b, 12) == "IHDR",
      "first chunk is not a 13-byte IHDR")
    val width = be32(b, 16)
    val height = be32(b, 20)
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    // Long offsets: a hostile u32 chunk length can't wrap the cursor
    var off = 8L
    var nChunks = 0L
    var idatBytes = 0L
    var ended = false
    while (off < b.length && !ended) {
      require(off + 8 <= b.length, s"truncated chunk header at $off")
      val len = be32(b, off.toInt)
      val t = tag(b, off.toInt + 4)
      require(off + 12 + len <= b.length, s"truncated $t chunk at $off")
      if (t == "IDAT") idatBytes += len
      if (t == "IEND") ended = true
      nChunks += 1
      off += 12 + len
    }
    require(ended, "no IEND chunk")
    PngInfo(mediaId, width, height, bitDepth, colorType, idatBytes, nChunks)
  }

  def parseOption(mediaId: Long, b: Array[Byte]): Option[PngInfo] =
    try Some(parse(mediaId, b)) catch { case _: IllegalArgumentException => None }

  /** The codec seam, same shape as StubCodec's: partition-wise decode,
    * setup once per partition, rows streamed through. */
  def decode(rows: Dataset[PngRow]): Dataset[PngInfo] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.flatMap(r => parseOption(r.media_id, r.payload)))
  }

  case class PixelStats(media_id: Long, width: Int, height: Int,
                        n_pixels: Long, sum_lum: Long, peak: Long,
                        mean_milli: Long)

  /** REAL zlib round-trip through the seam: build a grayscale
    * (color type 0, bit depth 8, width 32) PNG whose scanlines are
    * filter-0 rows of the document's UTF-8 bytes (last row
    * zero-padded), DEFLATED with the JDK's zlib — an actually
    * decodable IDAT stream, unlike [[syntheticPngs]]' raw stand-in. */
  def syntheticCompressedPngs(docs: Dataset[(Long, String)])
      : Dataset[PngRow] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions(_.map { case (id, text) =>
      val raw = text.getBytes("UTF-8")
      val w = 32
      val h = math.max(1, (raw.length + w - 1) / w)
      // filter byte 0 + w pixels per scanline, zero-padded tail
      val filtered = new Array[Byte](h * (w + 1))
      var r = 0
      while (r < h) {
        filtered(r * (w + 1)) = 0
        var c = 0
        while (c < w) {
          val src = r * w + c
          filtered(r * (w + 1) + 1 + c) =
            if (src < raw.length) raw(src) else 0
          c += 1
        }
        r += 1
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(filtered); defl.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
      defl.end()
      val idat = out.toByteArray
      def be32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      val payload =
        Signature ++
          be32(13) ++ "IHDR".getBytes("US-ASCII") ++
          be32(w.toLong) ++ be32(h.toLong) ++
          Array(8.toByte, 0.toByte, 0.toByte, 0.toByte, 0.toByte) ++
          be32(0) ++
          be32(idat.length.toLong) ++ "IDAT".getBytes("US-ASCII") ++
          idat ++ be32(0) ++
          be32(0) ++ "IEND".getBytes("US-ASCII") ++
          Array(0xAE, 0x42, 0x60, 0x82).map(_.toByte)
      PngRow(id, payload)
    })
  }

  /** FULL pixel decode: walk the chunks, INFLATE the concatenated
    * IDAT stream with the JDK's zlib, strip the per-scanline filter
    * bytes (only filter 0 accepted — the profile the writer above
    * emits), and reduce to exact-integer luminance stats. The
    * compression is lossless, so the stats equal those of the
    * pre-deflate bytes — which is exactly what the DuckDB oracle
    * recomputes from the document text, making a real
    * compress→decompress round-trip hash-gateable. */
  def decodePixels(rows: Dataset[PngRow]): Dataset[PixelStats] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.flatMap { r =>
      parseOption(r.media_id, r.payload).flatMap { info =>
        val b = r.payload
        // collect IDAT payloads
        val idat = new java.io.ByteArrayOutputStream()
        var off = 8L
        while (off + 12 <= b.length) {
          val len = be32(b, off.toInt)
          if (tag(b, off.toInt + 4) == "IDAT")
            idat.write(b, off.toInt + 8, len.toInt)
          off += 12 + len
        }
        val infl = new java.util.zip.Inflater()
        infl.setInput(idat.toByteArray)
        val w = info.width.toInt
        val h = info.height.toInt
        val filtered = new Array[Byte](h * (w + 1))
        try {
          var got = 0
          while (got < filtered.length && !infl.finished())
            got += infl.inflate(filtered, got, filtered.length - got)
          infl.end()
          if (got < filtered.length) None
          else {
            var sum = 0L
            var peak = 0L
            var ok = true
            var r2 = 0
            while (r2 < h) {
              if (filtered(r2 * (w + 1)) != 0) ok = false
              var c = 0
              while (c < w) {
                val v = (filtered(r2 * (w + 1) + 1 + c) & 0xff).toLong
                sum += v
                if (v > peak) peak = v
                c += 1
              }
              r2 += 1
            }
            val n = w.toLong * h
            if (!ok) None
            else Some(PixelStats(r.media_id, w, h, n, sum, peak,
              if (n > 0) 1000L * sum / n else 0L))
          }
        } catch {
          case _: java.util.zip.DataFormatException => None
        }
      }
    })
  }

  /** Synthesize a VALID PNG per document, entirely with Catalyst
    * binary expressions (concat of unhex'd big-endian fields): IHDR
    * dimensions derive from doc metadata, the text bytes stand in for
    * the IDAT stream. The parse side never sees these expressions —
    * the DuckDB oracle recomputes the expected fields from the doc
    * columns independently, so a wrong offset/endianness in EITHER the
    * writer or [[parse]] breaks the hash gate. Chunk CRCs are written
    * as zeros (the parser carries, never validates them; IEND's is the
    * spec constant since its data is empty). */
  def syntheticPngs(docs: DataFrame): DataFrame = {
    def u32(c: org.apache.spark.sql.Column) =
      unhex(lpad(hex(c), 8, "0"))
    val zeroCrc = unhex(lit("00000000"))
    val width = col("n_chars") % 640 + 16
    val height = col("n_chars") % 480 + 8
    val colorType = when(col("doc_id") % 2 === 0, 6).otherwise(2)
    val idat = encode(col("text"), "UTF-8")
    docs.select(
      col("doc_id").as("media_id"),
      concat(
        unhex(lit("89504E470D0A1A0A")),                   // signature
        u32(lit(13)), unhex(lit("49484452")),             // IHDR frame
        u32(width), u32(height),
        unhex(lit("08")),                                 // bit depth 8
        unhex(lpad(hex(colorType), 2, "0")),
        unhex(lit("000000")),                             // comp/filter/interlace
        zeroCrc,
        u32(octet_length(idat)), unhex(lit("49444154")),  // IDAT frame
        idat, zeroCrc,
        u32(lit(0)), unhex(lit("49454E44")),              // IEND frame
        unhex(lit("AE426082"))
      ).as("payload"))
  }
}
