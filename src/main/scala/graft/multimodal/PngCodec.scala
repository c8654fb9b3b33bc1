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
