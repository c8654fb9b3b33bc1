package graft.sources

import java.io.{BufferedOutputStream, OutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory

/** Decompress-once ingest for compressed MediaWiki dumps.
  *
  * Real dumps ship as one big `dump.xml.bz2`. A byte range into a
  * compressed stream is not decodable from the middle, so the
  * splittable scan (SplittableXml.planSplits) can only give such a
  * file ONE whole-file split — at 100 TB the decompression of a single
  * archive becomes the serial bottleneck no matter how many executors
  * wait behind it. The production answer (same as Hadoop's) is to pay
  * ONE streaming decompression up front and write the dump back out as
  * uncompressed part files sized for byte-range splitting; every scan
  * after that parallelizes in-file.
  *
  * This tool does that in a single bounded-memory pass: stream through
  * any Hadoop codec (.bz2, .gz, …), cut parts at `</page>` boundaries
  * once `targetBytes` is reached (a part overshoots by at most one
  * page, never cuts a record), replicate the dump header onto every
  * part and close each with the wrapper footer, so each part is a
  * well-formed document the native rowTag source can also read.
  *
  * Usage: runMain graft.sources.Bz2Ingest <dump.xml.bz2> <outDir> [targetMB]
  */
object Bz2Ingest {

  private val PageOpen = "<page>".getBytes("UTF-8")
  private val PageClose = "</page>".getBytes("UTF-8")
  private val Footer = "\n</mediawiki>\n".getBytes("UTF-8")

  def main(args: Array[String]): Unit = {
    val in = args(0)
    val outDir = args(1)
    val targetMB = if (args.length > 2) args(2).toInt else 64
    val t0 = System.nanoTime()
    val r = ingest(in, outDir, targetMB * 1024L * 1024L)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[bz2ingest] $in -> $outDir: ${r.parts} part(s), " +
      f"${r.compressedBytes / 1e6}%.1f MB compressed -> " +
      f"${r.decompressedBytes / 1e6}%.1f MB in $secs%.1f s " +
      f"(${r.decompressedBytes / 1e6 / secs}%.1f MB/s decompressed)")
  }

  final case class Result(parts: Int, compressedBytes: Long,
                          decompressedBytes: Long)

  /** One streaming pass: decompress `in` (suffix picks the Hadoop
    * codec), cut at the first `</page>` end after each `targetBytes`,
    * write `part%05d.xml` files under `outDir`. Memory is one 1 MB
    * read chunk + the pre-`<page>` header, independent of dump size. */
  def ingest(in: String, outDir: String, targetBytes: Long): Result = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val conf = new Configuration()
    val inPath = new Path(in)
    val fs = inPath.getFileSystem(conf)
    val codec = new CompressionCodecFactory(conf).getCodec(inPath)
    require(codec != null, s"no Hadoop codec claims $in (want .bz2/.gz/…)")
    val compressedBytes = fs.getFileStatus(inPath).getLen

    val outFs = new Path(outDir).getFileSystem(conf)
    outFs.mkdirs(new Path(outDir))

    val stream = codec.createInputStream(fs.open(inPath))
    val chunk = new Array[Byte](1024 * 1024)

    // phase 1: buffer until the first <page>, split header off.
    // (the header is KBs — site info — so buffering it whole is fine)
    val headBuf = new java.io.ByteArrayOutputStream()
    var headerEnd = -1 // index of PageOpen start within headBuf
    var n = stream.read(chunk)
    while (headerEnd < 0 && n > 0) {
      headBuf.write(chunk, 0, n)
      headerEnd = indexOfSlice(headBuf.toByteArray, PageOpen)
      if (headerEnd < 0) n = stream.read(chunk)
    }
    require(headerEnd >= 0, s"$in contains no <page> element")
    val buffered = headBuf.toByteArray
    val header = java.util.Arrays.copyOfRange(buffered, 0, headerEnd)

    // phase 2: stream pages, rotating parts once a part reaches
    // targetBytes at a </page> end (a part overshoots by at most one
    // page). Bytes are held in `pending` until their closing </page>
    // arrives, so the original wrapper footer — everything after the
    // LAST page — is naturally discarded and each part gets exactly
    // one constant footer. Memory bound: one page + one read chunk.
    // The matcher is a plain state machine ('<' occurs in </page>
    // only at index 0, so reset-on-mismatch is exact KMP for this
    // pattern) and survives chunk boundaries because its state lives
    // across reads.
    var parts = 0
    var out: OutputStream = null
    var partBytes = 0L
    var decompressed = buffered.length.toLong
    val pending = new java.io.ByteArrayOutputStream()
    def openPart(): Unit = {
      out = new BufferedOutputStream(
        outFs.create(new Path(outDir, f"part$parts%05d.xml"), true),
        1024 * 1024)
      parts += 1
      out.write(header)
      partBytes = header.length.toLong
    }
    def closePart(): Unit = if (out != null) {
      out.write(Footer)
      out.close()
      out = null
    }
    var matchState = 0
    def feed(data: Array[Byte], from: Int, until: Int): Unit = {
      var i = from
      var segStart = from
      while (i < until) {
        val b = data(i)
        matchState =
          if (b == PageClose(matchState)) matchState + 1
          else if (b == PageClose(0)) 1
          else 0
        if (matchState == PageClose.length) {
          matchState = 0
          // complete page: pending + data[segStart..i] moves to the part
          pending.write(data, segStart, i + 1 - segStart)
          segStart = i + 1
          if (out == null) openPart()
          pending.writeTo(out)
          partBytes += pending.size()
          pending.reset()
          if (partBytes >= targetBytes) closePart()
        }
        i += 1
      }
      pending.write(data, segStart, until - segStart)
    }

    feed(buffered, headerEnd, buffered.length)
    n = stream.read(chunk)
    while (n > 0) {
      decompressed += n
      feed(chunk, 0, n)
      n = stream.read(chunk)
    }
    stream.close()
    // pending now holds only the original wrapper footer (bytes after
    // the last </page>) — dropped; the final part closes with ours
    closePart()
    Result(parts, compressedBytes, decompressed)
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
