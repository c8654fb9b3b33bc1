package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, from_xml}
import org.apache.spark.sql.types.StructType

/** Splittable scan WITHIN a single huge XML file.
  *
  * Spark 4's native XML source parallelizes per FILE only (measured in
  * `graft.wiki.WikiScale`), so a single 100 GB MediaWiki dump degrades
  * to one scan task. The reference engine solves this with a
  * Mahout-derived record reader that byte-scans for the row tag inside
  * arbitrary byte ranges (/root/reference/src/mr/CountReference.java:
  * 94-203). This is the Spark-first equivalent:
  *
  *   1. the DRIVER plans byte ranges per file (exactly the split table
  *      a FileScanRDD would hold — a few dozen bytes per 128 MB range,
  *      so ~1M entries at 100 TB: driver-trivial);
  *   2. each EXECUTOR task scans its range for `<tag>...</tag>` byte
  *      spans under the reference's straddle rule (below), emitting one
  *      UTF-8 string per record;
  *   3. `from_xml` (the same StaxXmlParser that backs the native
  *      source, codegen-friendly, schema-pruned) parses records into
  *      columns.
  *
  * Straddle rule, bit-for-bit from CountReference.java:141-158,180-201:
  * a range owns every record whose START tag BEGINS inside
  * [start, end) — the between-records scan stops once the position
  * passes `end` while NOT mid-match, so a start tag straddling `end`
  * still belongs to this range, and the record body then reads past
  * `end` unbounded until the end tag. A task seeking into the middle of
  * some record finds no start tag before that record closes, so every
  * record is owned by exactly one range. The scanner also keeps the
  * reference's naive match reset (no re-check of the failed byte, no
  * KMP) and its exact-byte tag match — `<page attr="x">` would NOT
  * match, same as the reference; MediaWiki dumps emit bare `<page>`.
  */
object SplittableXml {

  /** One byte range of one file. */
  final case class XmlSplit(path: String, start: Long, end: Long)

  /** Columnar read: records scanned per-range, parsed with `from_xml`
    * against the explicit schema (never infer on a multi-GB dump).
    * `splitBytes <= 0` means use `spark.sql.files.maxPartitionBytes`. */
  def read(spark: SparkSession, path: String, rowTag: String,
           schema: StructType, splitBytes: Long = 0L): DataFrame = {
    import scala.jdk.CollectionConverters._
    records(spark, path, rowTag, splitBytes)
      .select(from_xml(col("value"), schema,
        Map.empty[String, String].asJava).as("r"))
      .select(col("r.*"))
  }

  /** Raw `<rowTag>...</rowTag>` record strings, one row each, one task
    * per planned byte range. */
  def records(spark: SparkSession, path: String, rowTag: String,
              splitBytes: Long = 0L): Dataset[String] = {
    import spark.implicits._
    val bytes =
      if (splitBytes > 0) splitBytes
      else JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes"))
    val splits = planSplits(spark, path, bytes)
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val startTag = s"<$rowTag>".getBytes("UTF-8")
    val endTag = s"</$rowTag>".getBytes("UTF-8")
    val rdd = spark.sparkContext
      .parallelize(splits, math.max(splits.length, 1))
      .mapPartitions(_.flatMap(s =>
        new TagRecordIterator(confBc.value.value, s, startTag, endTag)))
    spark.createDataset(rdd)
  }

  /** Byte ranges per file; glob- and directory-friendly. Follows the
    * Hadoop FileInputFormat SPLIT_SLOP convention: keep cutting full
    * splits while the remainder exceeds 1.1x splitBytes, then emit the
    * remainder as one final range — so a tail up to 10% over splitBytes
    * is merged into the last split, but anything larger still yields a
    * separate (possibly small) tail range.
    *
    * COMPRESSED files (any suffix a Hadoop codec claims: .gz, .bz2,
    * .zst, …) are never range-split: a byte range into a compressed
    * stream is not decodable from the middle, so each such file becomes
    * ONE whole-file split and the scanner decompresses it end to end —
    * the same per-file-parallelism fallback Hadoop's
    * FileInputFormat.isSplitable gives non-splittable codecs. (Real
    * MediaWiki dumps ship as .bz2/.gz; parallelism within one such
    * archive requires decompressing it once up front, exactly as with
    * Hadoop.) */
  def planSplits(spark: SparkSession, path: String,
                 splitBytes: Long): Seq[XmlSplit] = {
    require(splitBytes > 0, s"splitBytes must be positive: $splitBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val codecs = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
    val files = matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile)
      else Array(st)
    }.filter(_.getLen > 0)
    files.toSeq.flatMap { st =>
      val len = st.getLen
      if (codecs.getCodec(st.getPath) != null)
        // whole-file split; end is a decompressed-byte bound, so make
        // it unbounded — ownership is trivial with one range per file
        Seq(XmlSplit(st.getPath.toString, 0L, Long.MaxValue))
      else {
        val out = Seq.newBuilder[XmlSplit]
        var off = 0L
        while (len - off > (splitBytes * 1.1).toLong) {
          out += XmlSplit(st.getPath.toString, off, off + splitBytes)
          off += splitBytes
        }
        if (off < len) out += XmlSplit(st.getPath.toString, off, len)
        out.result()
      }
    }
  }
}

/** Hadoop Configuration is not java-serializable; ship it to executors
  * via its own writable form (Spark's internal SerializableConfiguration
  * is private[spark], so the pattern is reproduced here). */
private final class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Per-range record scanner; see [[SplittableXml]] for the ownership
  * rule. Executor-side only (constructed inside mapPartitions). */
private final class TagRecordIterator(
    conf: Configuration, split: SplittableXml.XmlSplit,
    startTag: Array[Byte], endTag: Array[Byte]) extends Iterator[String] {

  private val in: java.io.InputStream = {
    val p = new Path(split.path)
    val s = p.getFileSystem(conf).open(p)
    val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
      .getCodec(p)
    if (codec != null) {
      // compressed: whole-file split (planSplits guarantees start == 0,
      // end == Long.MaxValue); pos counts DECOMPRESSED bytes
      codec.createInputStream(s)
    } else {
      s.seek(split.start)
      s
    }
  }
  // Chunked read buffer: the scanner consumes inBuf(bufPos until bufLen)
  // in a tight local loop instead of one virtual in.read() call per byte
  // (the reference reads byte-at-a-time through a buffered stream;
  // chunking measured 45 -> 81 MB/s raw-scan on the 93 MB WikiScale
  // fixture, semantics identical — see readUntilMatch).
  private val inBuf = new Array[Byte](64 * 1024)
  private var bufLen = 0
  private var bufPos = 0
  // The iterator closes itself on exhaustion, but a consumer may stop
  // early (limit/take, task kill, downstream exception) — close at task
  // end unconditionally rather than leaking until executor GC.
  Option(org.apache.spark.TaskContext.get())
    .foreach(_.addTaskCompletionListener[Unit](_ => close()))
  private var pos = split.start
  private val buf = new ByteArrayOutputStream(64 * 1024)
  private var record: String = _
  private var closed = false

  advance()

  override def hasNext: Boolean = record != null

  override def next(): String = {
    if (record == null) throw new NoSuchElementException("exhausted split")
    val r = record
    advance()
    r
  }

  private def advance(): Unit = {
    record = null
    if (!closed && pos < split.end &&
        readUntilMatch(startTag, withinBlock = false)) {
      buf.reset()
      buf.write(startTag)
      if (readUntilMatch(endTag, withinBlock = true))
        record = buf.toString("UTF-8")
    }
    if (record == null) close()
  }

  /** The reference scanner verbatim in semantics
    * (CountReference.java:180-201): single match cursor, naive reset on
    * mismatch (the failed byte is NOT re-checked against the tag's
    * first byte — so `<<page>` misses the real tag, exactly as the
    * reference does), and the past-the-end check fires only between
    * records and only when not mid-match. That conjunction IS the
    * straddle rule.
    *
    * Corpus precondition (inherited with the naive reset): a literal
    * `<` run immediately before a real start tag (e.g. `<<page>`) makes
    * the scanner consume the tag's first byte in a failed partial match
    * and miss the record — and a range whose `end` lands inside that
    * run would also let the NEXT range seek past it, losing the record
    * silently. MediaWiki dumps XML-escape body text (`&lt;`), so `<`
    * only ever introduces markup and the case cannot occur; feeding
    * non-escaped XML would require a KMP-style reset that re-checks the
    * failed byte against tag(0) — a deliberate divergence we do not
    * take, to stay bit-for-bit with the reference. */
  private def readUntilMatch(tag: Array[Byte],
                             withinBlock: Boolean): Boolean = {
    var i = 0
    while (true) {
      if (bufPos >= bufLen) {
        bufLen = in.read(inBuf)
        bufPos = 0
        if (bufLen <= 0) return false
      }
      // Scan one buffered chunk with per-byte semantics identical to the
      // reference loop: match-advance first (completing a match returns
      // before the end check), naive reset to 0 on mismatch (the failed
      // byte is NOT re-checked), and the past-the-end check fires only
      // between records and only when not mid-match. Consumed slices are
      // bulk-written to the record buffer on every exit path.
      val limit = bufLen
      val posBase = pos - bufPos // abs position after consuming index p-1 is posBase + p
      val chunkStart = bufPos
      var p = bufPos
      while (p < limit) {
        val b = inBuf(p)
        p += 1
        if (b == tag(i)) {
          i += 1
          if (i >= tag.length) {
            if (withinBlock) buf.write(inBuf, chunkStart, p - chunkStart)
            pos = posBase + p
            bufPos = p
            return true
          }
        } else i = 0
        if (!withinBlock && i == 0 && posBase + p >= split.end) {
          pos = posBase + p
          bufPos = p
          return false
        }
      }
      if (withinBlock) buf.write(inBuf, chunkStart, p - chunkStart)
      pos = posBase + p
      bufPos = p
    }
    false // unreachable
  }

  private def close(): Unit = if (!closed) {
    closed = true
    in.close()
  }
}
