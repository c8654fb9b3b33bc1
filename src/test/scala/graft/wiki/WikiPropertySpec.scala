package graft.wiki

import graft.SparkSpec
import org.scalacheck.{Gen, rng}
import org.scalacheck.rng.Seed

/** Property-based parity: WikiPipeline.links must agree with a
  * line-faithful Scala replica of the reference's parseText
  * (/root/reference/src/mr/CountReference.java:246-266) on arbitrary
  * generated wikitext — including pipes, banned namespaces, newlines,
  * commas, nesting and unicode. One Spark job checks all samples.
  */
class WikiPropertySpec extends SparkSpec {

  /** Replica of parseText + the emptiness guard (:237) and title trim
    * (:263). Kept deliberately literal, quirks included. */
  private def referenceEmissions(title: String, text: String): Seq[(String, String)] = {
    if (title == null || title.isEmpty || text == null || text.isEmpty)
      return Seq.empty
    val banned = Seq("File:", "Categoria:", "Category:", "Aiuto:", "s:",
      "Image:", "Immagine:")
    val m = java.util.regex.Pattern.compile("\\[\\[(.*?)\\]\\]").matcher(text)
    val out = Seq.newBuilder[(String, String)]
    while (m.find()) {
      var ref = m.group(0)
      if (ref.contains("|")) ref = ref.split("\\|")(0)
      if (!banned.exists(ref.contains)) {
        ref = ref.replaceAll("\\[|\\]|\\,", "").trim
        if (ref.nonEmpty) out += ((ref, title.trim))
      }
    }
    out.result()
  }

  private val fragment: Gen[String] = Gen.oneOf(
    Gen.alphaLowerStr.map(s => s"[[${s.take(8)}]]"),
    Gen.alphaLowerStr.map(s => s"[[${s.take(6)}|alias]]"),
    Gen.oneOf("File:", "Categoria:", "Category:", "Aiuto:", "s:", "Image:",
      "Immagine:").flatMap(ns => Gen.alphaLowerStr.map(s => s"[[$ns${s.take(5)}]]")),
    Gen.const("[[a\nb]]"),
    Gen.const("[[Roma, Italia]]"),
    Gen.const("[[Roma#Storia]]"),
    Gen.const("[[  spaced  ]]"),
    Gen.const("[[]]"),
    Gen.const("[[A|B|C]]"),
    Gen.const("[[pipe|]]"),
    Gen.const("[[File:x.jpg|thumb|[[y]] caption]]"),
    Gen.const("[[Genesis: storia]]"),
    Gen.const("[[caffè]] [[über|u]]"),
    Gen.alphaLowerStr.map(_.take(10)), // plain prose
    Gen.const("]] stray [["))

  private val textGen: Gen[String] =
    Gen.listOfN(12, fragment).map(_.mkString(" "))

  test("pipeline emissions == reference replica on 200 generated texts") {
    import spark.implicits._
    val seed = Seed(42L)
    val samples = (0 until 200).map { i =>
      val s = textGen.apply(Gen.Parameters.default,
        seed.reseed(i.toLong)).getOrElse("")
      (s"T$i", s)
    }
    val df = samples.toDF("title", "text")
    val got = WikiPipeline.links(df)
      .select("page_from", "page_to").as[(String, String)]
      .collect().groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toSeq).toMap

    samples.foreach { case (title, text) =>
      val exp = referenceEmissions(title, text).map(_._1).sorted
      val act = got.getOrElse(title, Seq.empty)
      assert(act === exp, s"mismatch for '$text'")
    }
  }

  test("countDistinct invariant under within-page duplication") {
    import spark.implicits._
    val once = Seq(("P", "[[x]] [[y]]")).toDF("title", "text")
    val dup = Seq(("P", "[[x]] [[y]] [[x]] [[x]] [[y]]")).toDF("title", "text")
    val a = WikiPipeline.incomingReferenceCounts(WikiPipeline.links(once)).collect()
    val b = WikiPipeline.incomingReferenceCounts(WikiPipeline.links(dup)).collect()
    assert(a.map(r => (r.getString(0), r.getLong(1))).toSet
      === b.map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("link filter is idempotent (filtering output again changes nothing)") {
    import spark.implicits._
    val df = Seq(("T", "[[a]] [[File:b]] [[c|d]] [[Genesis: x]]")).toDF("title", "text")
    val l1 = WikiPipeline.links(df)
    // re-running the namespace filter on already-cleaned targets is a no-op
    val banned = WikiPipeline.BannedSubstrings
    import org.apache.spark.sql.functions.col
    val refiltered = l1.filter(!banned.map(col("page_to").contains(_)).reduce(_ || _))
    assert(refiltered.count() === l1.count())
  }
}
