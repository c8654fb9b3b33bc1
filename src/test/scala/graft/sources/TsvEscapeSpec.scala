package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the cell-escaping layer: unescape ∘ escape is the
  * identity on ARBITRARY strings (including ones full of the escape
  * characters themselves), and escaped output never carries a
  * structural byte — the two facts the TSV format's integrity rests
  * on. Deterministic scalacheck driving (fixed seed) keeps the suite
  * reproducible. */
class TsvEscapeSpec extends AnyFunSuite {

  private val nasty = Gen.listOf(Gen.oneOf(
    Gen.oneOf('\\', '\t', '\n', '\r'),
    Gen.alphaNumChar,
    Gen.choose(0.toChar, 0xFFFF.toChar)
  )).map(_.mkString)

  private def samples(n: Int): Seq[String] = {
    var seed = Seed(42L)
    (1 to n).flatMap { _ =>
      val s = nasty.apply(Gen.Parameters.default, seed)
      seed = seed.next
      s
    }
  }

  test("unescape(escape(s)) == s for arbitrary strings") {
    val cases = samples(500) ++ Seq("", "\\", "\\\\", "\\t", "\t",
      "\\n\n", "a\tb\nc\rd\\e", "\\x", "trailing\\")
    cases.foreach { s =>
      assert(TsvEscape.unescape(TsvEscape.escape(s)) === s,
        s"round-trip broke for ${s.map(_.toInt).mkString(",")}")
    }
  }

  test("escaped output never contains a structural byte") {
    samples(500).foreach { s =>
      val e = TsvEscape.escape(s)
      assert(!e.contains('\t') && !e.contains('\n') && !e.contains('\r'),
        s"structural byte leaked for ${s.map(_.toInt).mkString(",")}")
    }
  }

  test("escape is a no-op exactly on strings without special chars") {
    assert(TsvEscape.escape("plain text 123") eq "plain text 123")
    assert(TsvEscape.escape("with\ttab") !== "with\ttab")
  }
}
