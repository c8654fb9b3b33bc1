package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_bpe_encode's load-bearing claim: the rank-fold of exhaustive
  * left-to-right replaces equals the textbook BPE loop (repeatedly
  * merge ALL occurrences of the highest-ranked pair present). This
  * spec runs the textbook algorithm in plain Scala over every distinct
  * fixture word and compares segmentations symbol-for-symbol. */
class BpeEncodeSpec extends SparkSpec {

  /** Textbook BPE: find the best-ranked adjacent pair, merge every
    * occurrence left-to-right, repeat until no merge applies. */
  private def refBpe(word: String, merges: Seq[String]): Vector[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    while (true) {
      val present = syms.indices.dropRight(1)
        .map(i => syms(i) + syms(i + 1)).filter(rank.contains)
      if (present.isEmpty) return syms
      val best = present.minBy(rank)
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) + syms(i + 1) == best) {
          out += best; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  test("rank-fold encoding == textbook priority-loop on every fixture word") {
    val merges = TextQueries.bpeMerges(spark, sf0001)
    assert(merges.size === 30)
    val got = graft.Tables.load(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("word")).distinct()
      .select(col("word"), TextQueries.bpeEncode(merges).as("enc"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.nonEmpty)
    for ((word, enc) <- got) {
      val foldSyms = enc.split(" ").toVector.map(_.stripPrefix("#").stripSuffix("#"))
      val refSyms = refBpe(word, merges)
      assert(foldSyms === refSyms,
        s"'$word': fold gave $foldSyms, reference gave $refSyms")
      assert(foldSyms.mkString === word, s"'$word' not reconstructible")
    }
  }

  test("merges actually compress: multi-char symbols appear") {
    val merges = TextQueries.bpeMerges(spark, sf0001)
    val anyMerged = graft.Tables.load(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("word")).distinct()
      .select(TextQueries.bpeEncode(merges).as("enc"))
      .collect().exists(_.getString(0).split(" ").exists(_.length > 3))
    assert(anyMerged, "no merge ever applied — merge table is dead")
  }
}
