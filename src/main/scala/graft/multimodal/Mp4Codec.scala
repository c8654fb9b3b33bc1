package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The VIDEO container behind the multimodal codec seam: MP4
  * (ISO-BMFF, ISO/IEC 14496-12) — a recursive TREE of boxes, unlike
  * PNG's flat chunk list, WAV's flat RIFF, and JPEG's marker stream:
  * every box is a big-endian u32 size (which INCLUDES the 8-byte
  * header) + 4-byte type, with two escape hatches a real walker must
  * honor — `size == 1` means a u64 `largesize` follows the type
  * (payloads past 4 GiB, routine for video), and `size == 0` means
  * the box runs to end-of-file (the common tail `mdat`). Container
  * boxes (`moov`, `trak`, `mdia`) hold child boxes as their payload,
  * so parsing is a recursive descent, not a linear scan.
  *
  * [[parse]] validates `ftyp` first, walks the tree collecting the
  * movie header (`mvhd`: timescale + duration), the track count and
  * the first track's geometry (`tkhd` width/height, stored as 16.16
  * fixed point) and handler type (`hdlr`: vide/soun), and sizes the
  * `mdat` payload — the "index the corpus without decoding a frame"
  * pass of every video pipeline: codec-agnostic metadata from the
  * container alone. Runs through the identical mapPartitions seam as
  * the PNG/WAV/JPEG codecs; an actual frame decoder would plug in at
  * the same seam, reading sample offsets from `stbl` the same way.
  */
object Mp4Codec {

  /** Parsed container metadata for one MP4 payload. duration_ms is
    * integer-exact: duration ticks scaled by the movie timescale. */
  case class Mp4Info(media_id: Long, brand: String, timescale: Long,
                     duration: Long, duration_ms: Long, n_tracks: Long,
                     width: Long, height: Long, handler: String,
                     mdat_bytes: Long, n_boxes: Long)

  case class Mp4Row(media_id: Long, payload: Array[Byte])

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Box types whose payload is a list of child boxes (the subset this
    * walker descends; a full demuxer adds minf/stbl/edts the same
    * way). */
  private val containers = Set("moov", "trak", "mdia")

  private class Walk {
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var nTracks = 0L
    var width = -1L
    var height = -1L
    var handler: String = null
    var mdatBytes = -1L
    var nBoxes = 0L
  }

  /** One box header: (payload start, box end, type). Honors the u64
    * largesize (`size == 1`) and to-end-of-range (`size == 0`)
    * encodings. */
  private def header(b: Array[Byte], off: Int,
                     limit: Int): (Int, Int, String) = {
    require(off + 8 <= limit, s"truncated box header at $off")
    val size32 = u32(b, off)
    val typ = fourcc(b, off + 4)
    if (size32 == 1L) {
      require(off + 16 <= limit, s"truncated largesize box at $off")
      val size = u64(b, off + 8)
      require(size >= 16 && off + size <= limit,
        s"bad largesize $size for '$typ' at $off")
      (off + 16, off + size.toInt, typ)
    } else if (size32 == 0L) {
      (off + 8, limit, typ) // box extends to the end of its range
    } else {
      require(size32 >= 8 && off + size32 <= limit,
        s"bad size $size32 for '$typ' at $off")
      (off + 8, (off + size32).toInt, typ)
    }
  }

  private def walk(b: Array[Byte], start: Int, limit: Int,
                   w: Walk): Unit = {
    var off = start
    while (off < limit) {
      val (payload, end, typ) = header(b, off, limit)
      w.nBoxes += 1
      typ match {
        case t if containers.contains(t) =>
          if (t == "trak") w.nTracks += 1
          walk(b, payload, end, w)
        case "mvhd" =>
          require(end - payload >= 24, "mvhd too short")
          require((b(payload) & 0xff) == 0, "only mvhd version 0")
          w.timescale = u32(b, payload + 12)
          w.duration = u32(b, payload + 16)
        case "tkhd" if w.width < 0 => // first track's geometry
          require(end - payload >= 84, "tkhd too short")
          require((b(payload) & 0xff) == 0, "only tkhd version 0")
          // width/height are 16.16 fixed point at payload offsets
          // 76/80 (after ver/flags, times, ids, reserved, matrix)
          w.width = u32(b, payload + 76) >> 16
          w.height = u32(b, payload + 80) >> 16
        case "hdlr" if w.handler == null =>
          require(end - payload >= 12, "hdlr too short")
          w.handler = fourcc(b, payload + 8)
        case "mdat" =>
          w.mdatBytes = end - payload
        case _ => ()
      }
      off = end
    }
  }

  /** Strict parse; throws on malformed payloads (missing/misplaced
    * ftyp, truncated or oversized boxes, no moov, no mdat). */
  def parse(mediaId: Long, b: Array[Byte]): Mp4Info = {
    require(b.length >= 16, s"payload too short for an MP4: ${b.length}")
    val (ftypPayload, ftypEnd, ftypType) = header(b, 0, b.length)
    require(ftypType == "ftyp", s"first box is '$ftypType', not ftyp")
    require(ftypEnd - ftypPayload >= 8, "ftyp too short")
    val w = new Walk
    w.brand = fourcc(b, ftypPayload)
    w.nBoxes = 1
    walk(b, ftypEnd, b.length, w)
    require(w.timescale > 0, "no mvhd (or zero timescale)")
    require(w.mdatBytes >= 0, "no mdat")
    Mp4Info(mediaId, w.brand, w.timescale, w.duration,
      w.duration * 1000L / w.timescale, w.nTracks, w.width, w.height,
      if (w.handler == null) "" else w.handler, w.mdatBytes, w.nBoxes)
  }

  def parseOption(mediaId: Long, b: Array[Byte]): Option[Mp4Info] =
    try Some(parse(mediaId, b)) catch { case _: IllegalArgumentException => None }

  /** The codec seam, same shape as the PNG/WAV/JPEG codecs'. */
  def decode(rows: Dataset[Mp4Row]): Dataset[Mp4Info] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.flatMap(r => parseOption(r.media_id, r.payload)))
  }

  /** Synthesize a VALID minimal ISO-BMFF file per document with
    * Catalyst binary expressions: `ftyp(isom)` | `moov[ mvhd |
    * trak[ tkhd | mdia[ mdhd | hdlr ]]]` | `mdat(text bytes)`.
    * Geometry/timing derive from doc metadata; the DuckDB oracle
    * recomputes every field independently, so a wrong size, offset,
    * or 16.16 shift in EITHER writer or parser breaks the hash gate.
    * Box sizes are the spec-fixed v0 sizes (mvhd 108, tkhd 92,
    * mdhd 32, hdlr 33 with empty name), so the container sizes are
    * static (mdia 73, trak 173, moov 289) and only mdat's varies. */
  def syntheticMp4s(docs: DataFrame): DataFrame = {
    def be32(c: org.apache.spark.sql.Column) =
      unhex(lpad(hex(c), 8, "0"))
    val timescale = lit(1000) + (col("doc_id") % 5) * 200
    val duration = col("n_chars") * 40
    val width = col("n_chars") % 640 + 16
    val height = col("n_chars") % 360 + 9
    val video = col("doc_id") % 2 === 0
    val payload = encode(col("text"), "UTF-8")
    val unityMatrix =
      "00010000" + "00000000" + "00000000" +
      "00000000" + "00010000" + "00000000" +
      "00000000" + "00000000" + "40000000"
    docs.select(
      col("doc_id").as("media_id"),
      concat(
        unhex(lit("00000010" + "66747970" + "69736F6D" + "00000000")),
        unhex(lit("00000121" + "6D6F6F76")),                  // moov 289
        unhex(lit("0000006C" + "6D766864" + "00000000" +      // mvhd 108
          "00000000" + "00000000")),                          // c/m time
        be32(timescale), be32(duration),
        unhex(lit("00010000" + "0100" + "0000" +              // rate, vol
          "0000000000000000" + unityMatrix +                  // reserved
          "00" * 24 + "00000002")),                           // next track
        unhex(lit("000000AD" + "7472616B")),                  // trak 173
        unhex(lit("0000005C" + "746B6864" + "00000007" +      // tkhd 92
          "00000000" + "00000000" + "00000001" + "00000000")),
        be32(duration),
        unhex(lit("0000000000000000" + "0000" + "0000" +      // reserved,
          "0000" + "0000" + unityMatrix)),                    // layer, vol
        be32(width * 65536L), be32(height * 65536L),          // 16.16
        unhex(lit("00000049" + "6D646961")),                  // mdia 73
        unhex(lit("00000020" + "6D646864" + "00000000" +      // mdhd 32
          "00000000" + "00000000")),
        be32(timescale), be32(duration),
        unhex(lit("55C4" + "0000")),                          // lang 'und'
        unhex(lit("00000021" + "68646C72" + "00000000" +      // hdlr 33
          "00000000")),
        when(video, unhex(lit("76696465")))                   // 'vide'
          .otherwise(unhex(lit("736F756E"))),                 // 'soun'
        unhex(lit("00" * 13)),                                // reserved+nul
        be32(octet_length(payload) + 8),                      // mdat
        unhex(lit("6D646174")),
        payload
      ).as("payload"))
  }
}
