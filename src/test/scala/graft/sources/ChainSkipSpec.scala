package graft.sources

import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.{And, Predicate => V2Predicate}
import org.scalatest.funsuite.AnyFunSuite

/** The predicate→interval planner's edge behavior, pure-JVM: these
  * are the rules that make file skipping SOUND — a wrong tightening
  * here silently drops live files, so every boundary case is pinned. */
class ChainSkipSpec extends AnyFunSuite {

  private def ref(c: String) = Expressions.column(c)
  private def l(v: Long) = Expressions.literal(v)
  private def i(v: Int) = Expressions.literal(v)
  private def s(v: String) = Expressions.literal(
    org.apache.spark.unsafe.types.UTF8String.fromString(v))
  private def p(name: String,
                args: org.apache.spark.sql.connector.expressions
                  .Expression*) =
    new V2Predicate(name, args.toArray)

  test("strict bounds tighten to inclusive neighbors on integers; " +
    "saturation at Long edges refuses instead of overflowing") {
    val (used, b) = ChainSkip.extract(Array(
      p(">", ref("x"), l(10)), p("<", ref("x"), l(20))))
    assert(used.length === 2)
    assert(b("x") === ChainSkip.Bounds(11, 19))

    val (_, sat) = ChainSkip.extract(Array(
      p(">", ref("x"), l(Long.MaxValue))))
    assert(!sat.contains("x"), "x > Long.MaxValue must not overflow")
    val (_, sat2) = ChainSkip.extract(Array(
      p("<", ref("x"), l(Long.MinValue))))
    assert(!sat2.contains("x"))
  }

  test("flipped comparisons (literal first) mirror the operator; " +
    "int literals widen to long") {
    val (_, b) = ChainSkip.extract(Array(
      p("<=", i(100), ref("x")),  // 100 <= x  ≡  x >= 100
      p(">", l(200), ref("x")))) // 200 > x   ≡  x < 200 ≡ x <= 199
    assert(b("x") === ChainSkip.Bounds(100, 199))
  }

  test("AND recurses; repeated constraints intersect; IN becomes its " +
    "min/max envelope") {
    val (_, b) = ChainSkip.extract(Array(
      new And(p(">=", ref("x"), l(5)), p("<=", ref("x"), l(50))),
      p("IN", ref("x"), l(7), l(30), l(12))))
    assert(b("x") === ChainSkip.Bounds(7, 30))
  }

  test("exactKeys: = and IN pin finite sets, conjuncts intersect, " +
    "oversized sets are dropped") {
    val keys = ChainSkip.exactKeys(Array(
      p("IN", ref("k"), l(1), l(2), l(3)),
      p("=", ref("k"), l(2))))
    assert(keys("k") === Seq(2L))
    val big = ChainSkip.exactKeys(
      Array(p("IN", (ref("k") +: (1 to 50).map(v => l(v))): _*)),
      cap = 10)
    assert(!big.contains("k"))
    // a range predicate pins nothing exact
    assert(ChainSkip.exactKeys(Array(p(">=", ref("k"), l(1)))).isEmpty)
  }

  test("string bounds: closed UTF8 intervals; strict widens to " +
    "inclusive (sound); equality pins both ends; IN envelopes") {
    val b = ChainSkip.extractStr(Array(
      p(">", ref("lang"), s("de")), p("<", ref("lang"), s("it"))))
    assert(b("lang") === ChainSkip.SBounds(Some("de"), Some("it")))
    val e = ChainSkip.extractStr(Array(p("=", ref("lang"), s("en"))))
    assert(e("lang") === ChainSkip.SBounds(Some("en"), Some("en")))
    val in = ChainSkip.extractStr(Array(
      p("IN", ref("lang"), s("fr"), s("de"), s("it"))))
    assert(in("lang") === ChainSkip.SBounds(Some("de"), Some("it")))
  }

  test("unrecognized shapes contribute nothing — they can never " +
    "mis-prune (OR, NOT, non-literal comparisons, null literals)") {
    val (used, b) = ChainSkip.extract(Array(
      p("OR", p(">=", ref("x"), l(5)), p("<=", ref("y"), l(9))),
      p("NOT", p("=", ref("x"), l(5))),
      p("=", ref("x"), ref("y"))))
    assert(used.isEmpty && b.isEmpty)
    assert(ChainSkip.exactKeys(Array(
      p("OR", p("=", ref("x"), l(1)), p("=", ref("x"), l(2)))))
      .isEmpty)
  }
}
