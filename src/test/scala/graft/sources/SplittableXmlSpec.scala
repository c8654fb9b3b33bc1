package graft.sources

import graft.SparkSpec
import graft.wiki.WikiPipeline
import org.apache.spark.sql.functions._

/** The splittable in-file XML scan vs two independent baselines: Spark's
  * native per-file XML source on the reference fixture, and hand-built
  * documents with split boundaries forced into every awkward position
  * (inside records, inside tags). */
class SplittableXmlSpec extends SparkSpec {

  val fixtureXml =
    "/root/reference/result/i/itwiki-latest-pages-articles1-10pages.xml"

  private def fixtureRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("title"), col("revision.text").as("text"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("single split reproduces the native source row-for-row") {
    val native = fixtureRows(
      spark.read.option("rowTag", "page").schema(WikiPipeline.pageSchema)
        .xml(fixtureXml))
    val split = fixtureRows(SplittableXml.read(
      spark, fixtureXml, "page", WikiPipeline.pageSchema))
    assert(split === native)
    assert(split.size === 10)
  }

  test("many tiny splits: same rows, >1 scan partition, no dup/loss") {
    val ds = SplittableXml.records(spark, fixtureXml, "page",
      splitBytes = 8 * 1024) // 236 KB fixture -> ~29 ranges
    assert(ds.rdd.getNumPartitions > 1)
    val split = fixtureRows(SplittableXml.read(
      spark, fixtureXml, "page", WikiPipeline.pageSchema,
      splitBytes = 8 * 1024))
    val native = fixtureRows(
      spark.read.option("rowTag", "page").schema(WikiPipeline.pageSchema)
        .xml(fixtureXml))
    assert(split === native)
  }

  test("compressed input: whole-file split, records identical to plain") {
    // gzip the fixture; a byte range into a compressed stream is not
    // decodable mid-file, so planSplits must emit ONE whole-file split
    // even at tiny splitBytes, and the scanner must decompress
    val dir = java.nio.file.Files.createTempDirectory("xmlgz")
    val gz = dir.resolve("fixture.xml.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gz))
    java.nio.file.Files.copy(java.nio.file.Paths.get(fixtureXml), out)
    out.close()

    val splits = SplittableXml.planSplits(spark, gz.toString,
      splitBytes = 8 * 1024)
    assert(splits.length === 1)
    assert(splits.head.start === 0L && splits.head.end === Long.MaxValue)

    val compressed = fixtureRows(SplittableXml.read(
      spark, gz.toString, "page", WikiPipeline.pageSchema,
      splitBytes = 8 * 1024))
    val plain = fixtureRows(
      spark.read.option("rowTag", "page").schema(WikiPipeline.pageSchema)
        .xml(fixtureXml))
    assert(compressed === plain)
  }

  test("every boundary position: records owned exactly once") {
    // 40 records whose bodies differ in length so boundaries land inside
    // start tags, end tags, bodies, and between records as splitBytes
    // sweeps. Each record appears exactly once for EVERY split size.
    val docs = (0 until 40).map(i => s"<page><title>t$i</title>" +
      ("x" * (i * 3)) + "</page>").mkString("\n")
    val dir = java.nio.file.Files.createTempDirectory("splitxml")
    val f = dir.resolve("d.xml")
    java.nio.file.Files.write(f, docs.getBytes("UTF-8"))
    val expected = (0 until 40).map(i => s"t$i").toSet
    (7L to 200L by 13L).foreach { sb =>
      val titles = SplittableXml.records(spark, f.toString, "page", sb)
        .collect().map(s => s.replaceAll(".*<title>(.*?)</title>.*", "$1"))
      assert(titles.length === 40, s"splitBytes=$sb lost/duplicated rows")
      assert(titles.toSet === expected, s"splitBytes=$sb")
    }
  }

  test("straddle rule: record body reads past the split end") {
    // One record straddling the boundary: split 1 ends mid-body.
    val xml = "<page><title>long</title>" + ("y" * 500) +
      "</page><page><title>short</title></page>"
    val dir = java.nio.file.Files.createTempDirectory("straddle")
    val f = dir.resolve("s.xml")
    java.nio.file.Files.write(f, xml.getBytes("UTF-8"))
    val recs = SplittableXml.records(spark, f.toString, "page", 100L)
      .collect().sortBy(_.length)
    assert(recs.length === 2)
    assert(recs(0) === "<page><title>short</title></page>")
    assert(recs(1).contains("y" * 500))
  }

  test("planSplits: Hadoop SPLIT_SLOP — split while remaining > 1.1x") {
    // 1000 bytes at 300: remainders 1000,700,400 all exceed 330, so
    // three full splits are cut and a 100-byte tail survives — exactly
    // FileInputFormat's behavior (slop merges only tails <= 10% over).
    val dir = java.nio.file.Files.createTempDirectory("plan")
    val f = dir.resolve("p.xml")
    java.nio.file.Files.write(f, ("z" * 1000).getBytes("UTF-8"))
    val splits = SplittableXml.planSplits(spark, f.toString, 300L)
    assert(splits.map(s => s.end - s.start) === Seq(300L, 300L, 300L, 100L))
    assert(splits.head.start === 0L && splits.last.end === 1000L)
  }

  test("planSplits: tail within slop is merged into the last split") {
    // 1000 bytes at 480: after one split the remaining 520 <= 528
    // (1.1 x 480), so the slop rule emits one merged 520-byte tail
    // instead of a 480 + 40 pair.
    val dir = java.nio.file.Files.createTempDirectory("plan2")
    val f = dir.resolve("p2.xml")
    java.nio.file.Files.write(f, ("z" * 1000).getBytes("UTF-8"))
    val splits = SplittableXml.planSplits(spark, f.toString, 480L)
    assert(splits.map(s => s.end - s.start) === Seq(480L, 520L))
    assert(splits.head.start === 0L && splits.last.end === 1000L)
  }

  test("golden pipeline numbers hold through the splittable path") {
    val pages = SplittableXml.read(
        spark, fixtureXml, "page", WikiPipeline.pageSchema,
        splitBytes = 16 * 1024)
      .select(col("title"), col("revision.text").as("text"))
    val links = WikiPipeline.links(pages).cache()
    assert(links.count() === 1483L)
    assert(links.distinct().count() === 1261L)
    val counts = WikiPipeline.incomingReferenceCounts(links)
    assert(counts.count() === 1206L)
  }
}
