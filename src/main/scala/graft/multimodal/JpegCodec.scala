package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The third REAL format behind the multimodal codec seam: baseline
  * JPEG/JFIF — a MARKER-STREAM format, structurally unlike both PNG
  * (self-describing big-endian chunks) and WAV (little-endian RIFF
  * chunks): segments are `FF <marker>` followed by a big-endian u16
  * length that INCLUDES its own two bytes, and the entropy-coded scan
  * after SOS has no length at all — it runs until the EOI marker,
  * with literal 0xFF data bytes escaped as `FF 00` (byte stuffing).
  * Header triage therefore needs a real state machine, not fixed
  * offsets: walk segments to SOF0 for the frame geometry
  * (height/width are BE16 at payload offsets 1/3), then walk the
  * stuffed scan to EOI. This is the access pattern of every image
  * indexer: dimensions and component layout without running a DCT.
  *
  * [[parse]] validates SOI, walks segments (collecting SOF0 geometry,
  * counting DQT tables), requires SOF0 before SOS, then scans the
  * entropy stream honoring stuffing and restart markers (D0-D7) until
  * EOI. Runs through the identical mapPartitions seam as the PNG and
  * WAV codecs.
  */
object JpegCodec {

  /** Parsed frame header + stream stats for one JPEG payload. */
  case class JpegInfo(media_id: Long, width: Long, height: Long,
                      sample_bits: Int, n_components: Int,
                      n_dqt: Long, scan_bytes: Long, n_segments: Long)

  case class JpegRow(media_id: Long, payload: Array[Byte])

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Strict parse; throws on malformed payloads (bad SOI, truncated
    * segment, SOS before SOF0, unterminated scan). */
  def parse(mediaId: Long, b: Array[Byte]): JpegInfo = {
    require(b.length >= 4, s"payload too short for a JPEG: ${b.length}")
    require((b(0) & 0xff) == 0xFF && (b(1) & 0xff) == 0xD8, "bad SOI")
    var off = 2
    var nSegments = 0L
    var nDqt = 0L
    var width = -1L; var height = -1L
    var sampleBits = -1; var nComponents = -1
    var sawSof = false
    var inScan = false
    while (!inScan) {
      require(off + 4 <= b.length, s"truncated segment header at $off")
      require((b(off) & 0xff) == 0xFF, s"expected marker at $off")
      val marker = b(off + 1) & 0xff
      val len = u16(b, off + 2)
      require(len >= 2 && off + 2 + len <= b.length,
        s"truncated segment ${marker.toHexString} at $off")
      nSegments += 1
      marker match {
        case 0xC0 => // SOF0: precision(1) height(2 BE) width(2 BE) ncomp(1)
          require(len >= 8, "SOF0 too short")
          sampleBits = b(off + 4) & 0xff
          height = u16(b, off + 5)
          width = u16(b, off + 7)
          nComponents = b(off + 9) & 0xff
          require(len == 8 + 3 * nComponents, "SOF0 length/component mismatch")
          sawSof = true
        case 0xDB => nDqt += 1
        case 0xDA =>
          require(sawSof, "SOS before SOF0")
          inScan = true
        case _ => ()
      }
      off += 2 + len
    }
    // entropy-coded scan: data until EOI; FF 00 is a stuffed literal
    // 0xFF, FF D0-D7 are restart markers (part of the scan)
    val scanStart = off
    var ended = false
    while (!ended) {
      require(off < b.length, "scan ran off the payload with no EOI")
      if ((b(off) & 0xff) == 0xFF) {
        require(off + 1 < b.length, "dangling FF at payload end")
        val m = b(off + 1) & 0xff
        if (m == 0xD9) ended = true
        else {
          require(m == 0x00 || (m >= 0xD0 && m <= 0xD7),
            s"unexpected marker ${m.toHexString} inside scan at $off")
          off += 2
        }
      } else off += 1
    }
    JpegInfo(mediaId, width, height, sampleBits, nComponents,
      nDqt, off - scanStart, nSegments)
  }

  def parseOption(mediaId: Long, b: Array[Byte]): Option[JpegInfo] =
    try Some(parse(mediaId, b)) catch { case _: IllegalArgumentException => None }

  /** The codec seam, same shape as the PNG/WAV codecs'. */
  def decode(rows: Dataset[JpegRow]): Dataset[JpegInfo] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.flatMap(r => parseOption(r.media_id, r.payload)))
  }

  /** Synthesize a VALID baseline JFIF per document with Catalyst
    * binary expressions: geometry derives from doc metadata, the text
    * bytes stand in for the entropy-coded scan (ASCII ⇒ no 0xFF, so
    * no stuffing is needed in the writer; the parser handles it — see
    * JpegCodecSpec's stuffed-scan case). The DuckDB oracle recomputes
    * every field from the doc columns independently, so a wrong
    * offset/endianness in EITHER writer or parser breaks the hash
    * gate. Layout: SOI | APP0(JFIF) | DQT(one zeroed table) |
    * SOF0(geometry) | SOS | scan | EOI. */
  def syntheticJpegs(docs: DataFrame): DataFrame = {
    def be16(c: org.apache.spark.sql.Column) =
      unhex(lpad(hex(c), 4, "0"))
    val width = col("n_chars") % 512 + 32
    val height = col("n_chars") % 384 + 24
    val threeComp = col("doc_id") % 2 === 0
    val scan = encode(col("text"), "UTF-8")
    docs.select(
      col("doc_id").as("media_id"),
      concat(
        unhex(lit("FFD8")),                               // SOI
        unhex(lit("FFE0" + "0010" + "4A46494600" +        // APP0, len 16
          "0101" + "00" + "0001" + "0001" + "0000")),
        unhex(lit("FFDB" + "0043" + "00" + "00" * 64)),   // DQT, len 67
        unhex(lit("FFC0")),                               // SOF0
        be16(when(threeComp, 17).otherwise(11)),          // len 8 + 3*ncomp
        unhex(lit("08")),                                 // 8-bit samples
        be16(height), be16(width),
        when(threeComp, unhex(lit("03" + "011100" + "021100" + "031100")))
          .otherwise(unhex(lit("01" + "011100"))),
        unhex(lit("FFDA")),                               // SOS
        be16(when(threeComp, 12).otherwise(8)),           // len 6 + 2*ncomp
        when(threeComp, unhex(lit("03" + "0100" + "0200" + "0300")))
          .otherwise(unhex(lit("01" + "0100"))),
        unhex(lit("003F00")),                             // spectral range
        scan,
        unhex(lit("FFD9"))                                // EOI
      ).as("payload"))
  }
}
