package graft.multimodal

import graft.{SparkSpec, Tables}

/** Mp4Codec: golden-byte parse of a hand-built box tree, the
  * largesize / to-end-of-file size encodings, malformed rejection,
  * and the synthetic writer/parser roundtrip through the
  * partition-wise seam. */
class Mp4CodecSpec extends SparkSpec {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload

  private def fullbox(typ: String, payload: Array[Byte]): Array[Byte] =
    box(typ, new Array[Byte](4) ++ payload) // version 0, flags 0

  private def mvhd(ts: Long, dur: Long): Array[Byte] =
    fullbox("mvhd", new Array[Byte](8) ++ be32(ts) ++ be32(dur) ++
      new Array[Byte](80))

  private def tkhd(w: Long, h: Long): Array[Byte] =
    fullbox("tkhd", new Array[Byte](16) ++ be32(7L) /* duration */ ++
      new Array[Byte](52) ++ be32(w << 16) ++ be32(h << 16))

  private def hdlr(kind: String): Array[Byte] =
    fullbox("hdlr", new Array[Byte](4) ++ kind.getBytes("US-ASCII") ++
      new Array[Byte](13))

  private def ftyp(brand: String): Array[Byte] =
    box("ftyp", brand.getBytes("US-ASCII") ++ be32(0L))

  private def mp4(ts: Long, dur: Long, w: Long, h: Long,
                  data: Array[Byte]): Array[Byte] =
    ftyp("isom") ++
      box("moov", mvhd(ts, dur) ++
        box("trak", tkhd(w, h) ++
          box("mdia", hdlr("vide")))) ++
      box("mdat", data)

  test("golden parse: hand-built box tree") {
    val info = Mp4Codec.parse(3L, mp4(1000L, 2500L, 320L, 180L,
      "framedata".getBytes))
    assert(info === Mp4Codec.Mp4Info(3L, "isom", 1000L, 2500L, 2500L,
      1L, 320L, 180L, "vide", 9L, 8L))
  }

  test("duration_ms is integer-exact under a non-millisecond timescale") {
    val info = Mp4Codec.parse(1L, mp4(600L, 1234L, 64L, 64L,
      "x".getBytes))
    assert(info.duration_ms === 1234L * 1000L / 600L) // floor, 2056
  }

  test("largesize (size == 1) boxes walk correctly") {
    val data = "bigpayload".getBytes
    val largeMdat = be32(1L) ++ "mdat".getBytes("US-ASCII") ++
      be64(16L + data.length) ++ data
    val b = ftyp("isom") ++
      box("moov", mvhd(1000L, 100L) ++
        box("trak", tkhd(16L, 16L) ++ box("mdia", hdlr("soun")))) ++
      largeMdat
    val info = Mp4Codec.parse(2L, b)
    assert(info.mdat_bytes === data.length.toLong)
    assert(info.handler === "soun")
  }

  test("size == 0 means to-end-of-file (the common tail mdat)") {
    val data = "tail".getBytes
    val zeroMdat = be32(0L) ++ "mdat".getBytes("US-ASCII") ++ data
    val b = ftyp("isom") ++
      box("moov", mvhd(1000L, 100L) ++
        box("trak", tkhd(16L, 16L) ++ box("mdia", hdlr("vide")))) ++
      zeroMdat
    assert(Mp4Codec.parse(4L, b).mdat_bytes === 4L)
  }

  test("only the FIRST track's geometry and handler are reported") {
    val b = ftyp("isom") ++
      box("moov", mvhd(1000L, 100L) ++
        box("trak", tkhd(320L, 180L) ++ box("mdia", hdlr("vide"))) ++
        box("trak", tkhd(1L, 1L) ++ box("mdia", hdlr("soun")))) ++
      box("mdat", "d".getBytes)
    val info = Mp4Codec.parse(5L, b)
    assert(info.n_tracks === 2L)
    assert(info.width === 320L && info.height === 180L)
    assert(info.handler === "vide")
  }

  test("malformed payloads are rejected without throwing") {
    assert(Mp4Codec.parseOption(1L, Array[Byte](1, 2, 3)).isEmpty) // short
    // first box is not ftyp
    assert(Mp4Codec.parseOption(1L,
      box("free", new Array[Byte](8)) ++ mp4(1000L, 1L, 8L, 8L,
        "x".getBytes)).isEmpty)
    // box size runs past the payload end
    val good = mp4(1000L, 1L, 8L, 8L, "xyz".getBytes)
    assert(Mp4Codec.parseOption(1L, good.dropRight(2)).isEmpty)
    // box size below the 8-byte header minimum
    val tiny = ftyp("isom") ++ be32(4L) ++ "mdat".getBytes("US-ASCII")
    assert(Mp4Codec.parseOption(1L, tiny).isEmpty)
    // no moov (no mvhd → no timescale)
    assert(Mp4Codec.parseOption(1L,
      ftyp("isom") ++ box("mdat", "x".getBytes)).isEmpty)
    // no mdat
    assert(Mp4Codec.parseOption(1L,
      ftyp("isom") ++ box("moov", mvhd(1000L, 1L))).isEmpty)
    // truncated largesize header
    assert(Mp4Codec.parseOption(1L,
      ftyp("isom") ++ be32(1L) ++ "mdat".getBytes("US-ASCII") ++
        be32(0L)).isEmpty)
  }

  test("synthetic writer and parser roundtrip through the seam") {
    import spark.implicits._
    val docs = Tables.load(spark, sf0001, "documents")
    val rows = Mp4Codec.syntheticMp4s(docs).as[Mp4Codec.Mp4Row]
    val parsed = Mp4Codec.decode(rows).toDF().collect()
    assert(parsed.length === docs.count())
    val byId = docs.select("doc_id", "n_chars", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    parsed.foreach { p =>
      val d = byId(p.getLong(0))
      val ts = 1000L + (d.getLong(0) % 5) * 200
      val dur = d.getLong(1) * 40
      assert(p.getString(1) === "isom")
      assert(p.getLong(2) === ts)
      assert(p.getLong(3) === dur)
      assert(p.getLong(4) === dur * 1000 / ts)
      assert(p.getLong(5) === 1L)                         // n_tracks
      assert(p.getLong(6) === d.getLong(1) % 640 + 16)    // width
      assert(p.getLong(7) === d.getLong(1) % 360 + 9)     // height
      assert(p.getString(8) ===
        (if (d.getLong(0) % 2 == 0) "vide" else "soun"))
      assert(p.getLong(9) === d.getString(2).getBytes("UTF-8").length)
      assert(p.getLong(10) === 9L)                        // n_boxes
    }
  }
}
