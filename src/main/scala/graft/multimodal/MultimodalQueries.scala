package graft.multimodal

import graft.Tables
import graft.queries.CoreQueries.Q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  * The testdata has no real media, so the payload is the UTF-8 encoding
  * of `text` — the POINT is the Spark-side plumbing (binary columns,
  * metadata extraction, deterministic content addressing), which is
  * identical for real image/audio bytes. The decode/feature-extract step
  * that would need codec libraries lives in [[MultimodalPipeline]] as a
  * partition-wise operator with a stubbed codec.
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    // binary payload metadata: byte length, content hash (the id a
    // CAS/dedup layer would use), head-bytes hex signature ("magic
    // number" sniffing on real media)
    Q("q_multimodal_meta",
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast(LongType).as("n_bytes"),
          md5(col("text")).as("payload_md5"),
          upper(hex(encode(substring(col("text"), 1, 8), "UTF-8")))
            .as("head_hex"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |md5(text) AS payload_md5,
             |upper(hex(encode(substr(text, 1, 8)))) AS head_hex
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // the decode path itself under the hash gate: media rows flow
    // through decodeAndExtract (mapPartitions + StubCodec), and every
    // stub feature is recomputed independently by DuckDB byte-for-byte.
    // The float 8-bin histogram is multiplied back to exact per-bin
    // counts (count = round(fraction * n) is lossless: the float32
    // fraction's relative error ~6e-8 stays far below 0.5/n at any
    // payload size here), so no float-division hashing hazard. The
    // sha_head oracle substr()s by CHARS where Spark slices 64 BYTES —
    // equal because the synthetic corpus is pure ASCII (asserted
    // cheaply: q_multimodal_meta's n_bytes already ties octet_length to
    // the same encode()).
    Q("q_multimodal_features",
      (s, d) => {
        import org.apache.spark.sql.functions.round
        val feats = MultimodalPipeline.decodeAndExtract(
          MultimodalPipeline.mediaFromDocuments(s, d)).toDF()
        val bins = (0 until 8).map(j =>
          round(element_at(col("feature"), j + 1).cast(DoubleType) *
            col("n_bytes")).cast(LongType).as(s"bin$j"))
        feats.select(
          Seq(col("media_id"), col("kind"), col("n_bytes"),
            col("sha_head"), col("mean_byte"),
            col("n_frames").cast(LongType).as("n_frames")) ++ bins: _*)
          .orderBy("media_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, text, hex(encode(text)) AS h,
             |         octet_length(encode(text)) AS n
             |  FROM documents),
             |bytes AS (
             |  SELECT doc_id,
             |         CAST('0x' || substr(h, 2*i - 1, 2) AS INT) AS v
             |  FROM base, unnest(range(1, n + 1)) AS t(i)),
             |agg AS (
             |  SELECT doc_id,
             |         CAST(SUM(v) AS DOUBLE) / count(*) AS mean_byte,
             |         CAST(SUM(CASE WHEN v // 32 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS bin0,
             |         CAST(SUM(CASE WHEN v // 32 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bin1,
             |         CAST(SUM(CASE WHEN v // 32 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS bin2,
             |         CAST(SUM(CASE WHEN v // 32 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS bin3,
             |         CAST(SUM(CASE WHEN v // 32 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS bin4,
             |         CAST(SUM(CASE WHEN v // 32 = 5 THEN 1 ELSE 0 END) AS BIGINT) AS bin5,
             |         CAST(SUM(CASE WHEN v // 32 = 6 THEN 1 ELSE 0 END) AS BIGINT) AS bin6,
             |         CAST(SUM(CASE WHEN v // 32 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS bin7
             |  FROM bytes GROUP BY doc_id)
             |SELECT b.doc_id AS media_id,
             |  CASE WHEN b.doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
             |  CAST(b.n AS BIGINT) AS n_bytes,
             |  substr(md5(substr(b.text, 1, 64)), 1, 8) AS sha_head,
             |  coalesce(a.mean_byte, 0.0) AS mean_byte,
             |  CAST(ceil(b.n / 256.0) AS BIGINT) AS n_frames,
             |  coalesce(a.bin0, 0) AS bin0, coalesce(a.bin1, 0) AS bin1,
             |  coalesce(a.bin2, 0) AS bin2, coalesce(a.bin3, 0) AS bin3,
             |  coalesce(a.bin4, 0) AS bin4, coalesce(a.bin5, 0) AS bin5,
             |  coalesce(a.bin6, 0) AS bin6, coalesce(a.bin7, 0) AS bin7
             |FROM base b LEFT JOIN agg a USING (doc_id)
             |ORDER BY media_id""".stripMargin)),

    // a REAL format through the codec seam: every document becomes a
    // VALID PNG (signature + IHDR + IDAT + IEND, built with Catalyst
    // binary expressions — dimensions from doc metadata, text bytes as
    // the IDAT stream), and PngCodec.parse reads the header fields back
    // from their fixed byte offsets and walks the chunk list, inside
    // the same mapPartitions seam as the stub pipeline. The oracle
    // recomputes every expected field from the doc columns, so a wrong
    // offset or endianness in the writer OR the parser breaks the hash.
    Q("q_multimodal_png",
      (s, d) => {
        import s.implicits._
        val pngs = PngCodec.syntheticPngs(Tables.load(s, d, "documents"))
          .as[PngCodec.PngRow]
        PngCodec.decode(pngs).toDF()
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
             |CAST(n_chars % 640 + 16 AS BIGINT) AS width,
             |CAST(n_chars % 480 + 8 AS BIGINT) AS height,
             |CAST(8 AS INT) AS bit_depth,
             |CAST(CASE WHEN doc_id % 2 = 0 THEN 6 ELSE 2 END AS INT) AS color_type,
             |CAST(octet_length(encode(text)) AS BIGINT) AS idat_bytes,
             |CAST(3 AS BIGINT) AS n_chunks
             |FROM documents ORDER BY media_id""".stripMargin)),

    // the AUDIO format through the same seam: every document becomes a
    // valid little-endian PCM WAV (RIFF/WAVE/fmt/data framing built
    // with Catalyst binary expressions — fmt fields from doc metadata,
    // text bytes as whole sample frames) and WavCodec.parse reads the
    // header back and derives sample count + integer-exact duration.
    // PNG above is big-endian, WAV little-endian: parsing both under
    // one gate pins the byte-order handling on writer AND parser.
    Q("q_multimodal_wav",
      (s, d) => {
        import s.implicits._
        val wavs = WavCodec.syntheticWavs(Tables.load(s, d, "documents"))
          .as[WavCodec.WavRow]
        WavCodec.decode(wavs).toDF()
          .orderBy("media_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    CAST(1 + doc_id % 2 AS INT) AS channels,
             |    CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
             |    (1 + doc_id % 2) * 2 AS block_align,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS raw_len
             |  FROM documents),
             |s AS (
             |  SELECT doc_id, channels, sample_rate, block_align,
             |    raw_len - raw_len % block_align AS data_bytes
             |  FROM m)
             |SELECT doc_id AS media_id, channels, sample_rate,
             |  CAST(16 AS INT) AS bits_per_sample, data_bytes,
             |  data_bytes // block_align AS n_samples,
             |  (data_bytes // block_align) * 1000 // sample_rate
             |    AS duration_ms,
             |  CAST(2 AS BIGINT) AS n_chunks
             |FROM s ORDER BY media_id""".stripMargin)),

    // FULL PIXEL DECODE through REAL zlib — the upgrade over
    // q_multimodal_png's header triage: the writer DEFLATES filter-0
    // grayscale scanlines into a genuinely decodable IDAT (JDK zlib at
    // the build seam) and the reader INFLATES it, strips the filter
    // bytes, and reduces to exact-integer luminance stats. Because
    // deflate is lossless, the stats equal those of the pre-compression
    // source bytes — which is what the oracle recomputes straight from
    // the document text, so a single wrong byte anywhere in the
    // compress → chunk → walk → inflate → defilter path breaks the
    // hash. At 100 TB this is the map-only decode+featurize pass of an
    // image-quality filter; only 4 numbers per asset leave the row.
    Q("q_multimodal_pixels",
      (s, d) => {
        import s.implicits._
        val src = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
        PngCodec.decodePixels(PngCodec.syntheticCompressedPngs(src))
          .toDF().orderBy("media_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, text,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS len
             |  FROM documents),
             |v AS (
             |  SELECT doc_id, len,
             |    greatest(1, (len + 31) // 32) AS h,
             |    list_transform(range(1, CAST(len + 1 AS INT)),
             |      i -> ascii(substr(text, CAST(i AS INT), 1))) AS vals
             |  FROM m)
             |SELECT doc_id AS media_id, CAST(32 AS INT) AS width,
             |  CAST(h AS INT) AS height,
             |  CAST(32 * h AS BIGINT) AS n_pixels,
             |  CAST(coalesce(list_sum(vals), 0) AS BIGINT) AS sum_lum,
             |  CAST(coalesce(list_max(vals), 0) AS BIGINT) AS peak,
             |  (1000 * CAST(coalesce(list_sum(vals), 0) AS BIGINT))
             |    // (32 * h) AS mean_milli
             |FROM v ORDER BY media_id""".stripMargin)),

    // AUDIO FEATURE EXTRACTION over the parsed PCM — the step after
    // q_multimodal_wav's header decode: per file, sample-point count,
    // L1 energy Σ|s|, peak amplitude, and the exact milli mean of a
    // 16-bit LE walk over the data chunk (WavCodec.features, the
    // mapPartitions codec seam). All integers, so the oracle replays
    // the arithmetic from the synthetic payload's SOURCE bytes
    // (sample k = byte(2k) + 256·byte(2k+1); ASCII source keeps the
    // high byte < 0x80, so sign extension is the identity — the
    // codec still implements it for real payloads). At scale this is
    // the map-only per-asset feature pass a filter like "drop silent/
    // clipped audio" runs on — nothing leaves the row but 4 numbers.
    Q("q_multimodal_audio_features",
      (s, d) => {
        import s.implicits._
        val wavs = WavCodec.syntheticWavs(Tables.load(s, d, "documents"))
          .as[WavCodec.WavRow]
        WavCodec.features(wavs).toDF().orderBy("media_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, text,
             |    (1 + doc_id % 2) * 2 AS block_align,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS raw_len
             |  FROM documents),
             |sz AS (
             |  SELECT doc_id, text,
             |    (raw_len - raw_len % block_align) // 2 AS n_points
             |  FROM m),
             |f AS (
             |  SELECT doc_id, n_points,
             |    list_transform(range(0, n_points),
             |      k -> ascii(substr(text, CAST(2 * k + 1 AS INT), 1))
             |        + 256 * ascii(substr(text, CAST(2 * k + 2 AS INT), 1)))
             |      AS vals
             |  FROM sz)
             |SELECT doc_id AS media_id, n_points,
             |  CAST(coalesce(list_sum(vals), 0) AS BIGINT) AS sum_abs,
             |  CAST(coalesce(list_max(vals), 0) AS BIGINT) AS peak,
             |  CASE WHEN n_points > 0
             |    THEN (1000 * CAST(list_sum(vals) AS BIGINT)) // n_points
             |    ELSE 0 END AS mean_milli
             |FROM f ORDER BY media_id""".stripMargin)),

    // REAL JPEG/JFIF parse through the same seam (JpegCodec): the
    // MARKER-STREAM complement of PNG's BE chunks and WAV's LE RIFF —
    // variable segment walk to SOF0 for the geometry, then a
    // byte-stuffing-aware scan to EOI. Every parsed field is
    // recomputed by the oracle from the doc columns, so a wrong
    // offset/endianness in writer OR parser breaks the hash gate.
    Q("q_multimodal_jpeg",
      (s, d) => {
        import s.implicits._
        val jpegs = JpegCodec.syntheticJpegs(Tables.load(s, d, "documents"))
          .as[JpegCodec.JpegRow]
        JpegCodec.decode(jpegs).toDF()
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
             |CAST(n_chars % 512 + 32 AS BIGINT) AS width,
             |CAST(n_chars % 384 + 24 AS BIGINT) AS height,
             |CAST(8 AS INT) AS sample_bits,
             |CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INT)
             |  AS n_components,
             |CAST(1 AS BIGINT) AS n_dqt,
             |CAST(octet_length(encode(text)) AS BIGINT) AS scan_bytes,
             |CAST(4 AS BIGINT) AS n_segments
             |FROM documents ORDER BY media_id""".stripMargin)),

    // REAL VIDEO CONTAINER parse through the same seam (Mp4Codec):
    // ISO-BMFF is a recursive box TREE — the fourth structural family
    // after PNG's flat BE chunks, WAV's flat LE RIFF, and JPEG's
    // marker stream — so the walker is a recursive descent honoring
    // the u64-largesize and to-end-of-file size encodings. Every
    // container-level field a video indexer needs (brand, movie
    // timescale/duration, track count, 16.16 track geometry, handler
    // type, mdat size, box census) is parsed from the tree and
    // recomputed independently by the oracle from the doc columns —
    // a wrong box size, offset, or fixed-point shift in writer OR
    // parser breaks the hash. Completes the modality set on real
    // formats: image, audio, video.
    Q("q_multimodal_mp4",
      (s, d) => {
        import s.implicits._
        val mp4s = Mp4Codec.syntheticMp4s(Tables.load(s, d, "documents"))
          .as[Mp4Codec.Mp4Row]
        Mp4Codec.decode(mp4s).toDF()
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id, 'isom' AS brand,
             |CAST(1000 + (doc_id % 5) * 200 AS BIGINT) AS timescale,
             |CAST(n_chars * 40 AS BIGINT) AS duration,
             |(n_chars * 40 * 1000) // (1000 + (doc_id % 5) * 200)
             |  AS duration_ms,
             |CAST(1 AS BIGINT) AS n_tracks,
             |CAST(n_chars % 640 + 16 AS BIGINT) AS width,
             |CAST(n_chars % 360 + 9 AS BIGINT) AS height,
             |CASE WHEN doc_id % 2 = 0 THEN 'vide' ELSE 'soun' END
             |  AS handler,
             |CAST(octet_length(encode(text)) AS BIGINT) AS mdat_bytes,
             |CAST(9 AS BIGINT) AS n_boxes
             |FROM documents ORDER BY media_id""".stripMargin)),

    // video-style FRAME SAMPLING over an opaque payload: the payload is
    // a sequence of fixed-size 16-byte frames; sample every 4th frame
    // and emit per-frame metadata (offset, content hash, head byte).
    // This is the training-pipeline "decode 1-in-k frames" access
    // pattern as pure expressions: sequence(start, stop, step) builds
    // the sampled index list per row with NO generator fan-out beyond
    // the kept frames (explode yields only sampled rows — the skipped
    // frames are never materialized), and each frame is a bounded
    // substring slice of the payload. No shuffle at all until the
    // final presentation sort; at 100 TB this is a map-only pass whose
    // output is 1/stride of a full decode. (Payload stands in as the
    // ASCII text column — same byte==char equivalence the PNG oracle
    // asserts; a real codec plugs in at the same slice boundary.)
    // nearest-neighbor RESIZE (downsample 2x in both dimensions) over
    // the payload viewed as a 16-byte-wide pixel grid: output pixel
    // (r, c) = input byte at (2r * 16 + 2c) — the classic stride-2
    // sample, built from a nested per-row index transform + bounded
    // 1-byte slices and re-concatenated. Pure expressions, map-only,
    // output bytes = 1/4 of input: the "thumbnail the corpus" pass.
    // The oracle recomputes the resized payload byte-for-byte (md5
    // compared), so a wrong stride, offset, or row order breaks the
    // hash. A real image codec plugs in at the same grid abstraction
    // (decode -> H x W byte planes -> stride sample -> re-encode).
    Q("q_multimodal_resize",
      (s, d) => {
        val w = 16L
        // spread: the nested per-pixel transform (out_h x 8 substr
        // calls per row) is the battery's heaviest map-only expression
        // and ran in the scan's ONE task (guide §2.5)
        graft.Tables.spread(Tables.load(s, d, "documents"))
          .select(col("doc_id").as("media_id"), col("text"),
            floor(octet_length(col("text")) / w).cast(LongType).as("in_h"))
          .filter(col("in_h") >= 2)
          .withColumn("out_h", floor(col("in_h") / 2).cast(LongType))
          .withColumn("resized",
            array_join(transform(
              sequence(lit(0L), col("out_h") - 1),
              r => array_join(transform(
                sequence(lit(0L), lit(7L)),
                c => col("text").substr(
                  (r * (2 * w) + c * 2 + 1).cast(IntegerType), lit(1))),
                "")), ""))
          .select(col("media_id"), col("in_h"), col("out_h"),
            lit(8L).as("out_w"),
            octet_length(col("resized")).cast(LongType).as("out_len"),
            md5(col("resized")).as("out_md5"))
          .orderBy("media_id")
      },
      Some("""WITH g AS (
             |  SELECT doc_id AS media_id, text,
             |    CAST(floor(octet_length(encode(text)) / 16) AS BIGINT)
             |      AS in_h
             |  FROM documents),
             |r AS (
             |  SELECT media_id, in_h, CAST(floor(in_h / 2) AS BIGINT) AS out_h,
             |    array_to_string(list_transform(range(0, CAST(floor(in_h / 2) AS BIGINT)),
             |      r -> array_to_string(list_transform(range(0, 8),
             |        c -> substr(text, CAST(r * 32 + c * 2 + 1 AS INT), 1)),
             |        '')), '') AS resized
             |  FROM g WHERE in_h >= 2)
             |SELECT media_id, in_h, out_h, CAST(8 AS BIGINT) AS out_w,
             |  CAST(octet_length(encode(resized)) AS BIGINT) AS out_len,
             |  md5(resized) AS out_md5
             |FROM r ORDER BY media_id""".stripMargin)),

    Q("q_multimodal_frames",
      (s, d) => {
        val fs = 16L
        val stride = 4L
        Tables.load(s, d, "documents")
          .select(col("doc_id").as("media_id"), col("text"),
            floor(octet_length(col("text")) / fs).cast(LongType)
              .as("n_frames"))
          .filter(col("n_frames") >= 1)
          .select(col("media_id"), col("text"), col("n_frames"),
            explode(sequence(lit(0L), col("n_frames") - 1, lit(stride)))
              .as("frame_idx"))
          .select(col("media_id"), col("frame_idx"),
            (col("frame_idx") * fs).as("off"),
            md5(col("text").substr(
              (col("frame_idx") * fs + 1).cast(IntegerType), lit(fs.toInt)))
              .as("frame_md5"),
            ascii(col("text").substr(
              (col("frame_idx") * fs + 1).cast(IntegerType), lit(1)))
              .as("head_byte"))
          .orderBy("media_id", "frame_idx")
      },
      Some("""WITH f AS (
             |  SELECT doc_id AS media_id, text,
             |    CAST(floor(octet_length(encode(text)) / 16) AS BIGINT)
             |      AS n_frames
             |  FROM documents),
             |e AS (
             |  SELECT media_id, text,
             |    unnest(range(0, n_frames, 4)) AS frame_idx
             |  FROM f WHERE n_frames >= 1)
             |SELECT media_id, frame_idx, frame_idx * 16 AS off,
             |  md5(substr(text, CAST(frame_idx * 16 + 1 AS INT), 16))
             |    AS frame_md5,
             |  ascii(substr(text, CAST(frame_idx * 16 + 1 AS INT), 1))
             |    AS head_byte
             |FROM e ORDER BY media_id, frame_idx""".stripMargin))
  )
}
