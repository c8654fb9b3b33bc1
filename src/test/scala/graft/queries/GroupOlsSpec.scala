package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** q_group_ols's slope composition, moved OUT of the oracle-gated row
  * (round 11): the gated row carries only the five raw moments
  * (n, sx, sy, sxy, sxx) — summed in DECIMAL(18,0) internally, emitted
  * as BIGINT since round 12 so the wire carries no decimal128 at all;
  * the version-sensitive part — the int128 cross-product num/den of
  * the closed-form OLS slope — is recomposed HERE from the gated row
  * in exact BigInt arithmetic and checked against an independent
  * per-row fold over the raw events, so the slope math stays pinned
  * without riding on any engine's 128-bit decimal path. The spec also
  * pins the int64 headroom guard: every moment must stay below 2^62,
  * so a scale factor big enough to threaten the BIGINT outputs fails
  * loudly here instead of wrapping silently. */
class GroupOlsSpec extends SparkSpec {

  test("slope num/den recomposed from gated moments matches a direct " +
    "BigInt fold over the raw rows, and den > 0 per group") {
    val gated = SparkEntry.queries("q_group_ols")(spark, sf001)
      .collect()
      .map { r =>
        r.getString(0) -> (BigInt(r.getLong(1)),
          BigInt(r.getLong(2)), BigInt(r.getLong(3)),
          BigInt(r.getLong(4)), BigInt(r.getLong(5)))
      }.toMap
    assert(gated.nonEmpty)

    // independent fold: same x/y definition, accumulated per row in
    // BigInt on the driver (sf0.01 events fit trivially)
    val raw = Tables.load(spark, sf001, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 1000000 - 1700000000").as("x"),
        round(col("value") * 100).cast("long").as("y"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (et, rows) =>
        val xs = rows.map(r => BigInt(r.getLong(1)))
        val ys = rows.map(r => BigInt(r.getLong(2)))
        et -> (BigInt(rows.length), xs.sum, ys.sum,
          xs.zip(ys).map { case (a, b) => a * b }.sum,
          xs.map(a => a * a).sum)
      }

    assert(gated.keySet === raw.keySet)
    for ((et, (n, sx, sy, sxy, sxx)) <- raw) {
      val (gn, gsx, gsy, gsxy, gsxx) = gated(et)
      assert(gn === n, s"$et n")
      assert(gsx === sx, s"$et sx")
      assert(gsy === sy, s"$et sy")
      assert(gsxy === sxy, s"$et sxy")
      assert(gsxx === sxx, s"$et sxx")
      // the composition that used to live in the gated row: exact
      // rational slope (num, den), den strictly positive whenever a
      // group has ≥2 distinct x (Cauchy–Schwarz is strict)
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      assert(den > 0, s"$et den must be > 0 (distinct timestamps)")
      // moments stay within DECIMAL(18,0) — the documented bound that
      // keeps both engines' sums exact
      val cap = BigInt(10).pow(18)
      for (m <- Seq(sx.abs, sy.abs, sxy.abs, sxx.abs))
        assert(m < cap, s"$et moment exceeds DECIMAL(18,0)")
      // BIGINT wire headroom (round 12): the gated outputs are int64;
      // require 2x slack under 2^63 so a larger SF trips this assert
      // long before the cast could wrap
      val cap62 = BigInt(2).pow(62)
      for (m <- Seq(sx.abs, sy.abs, sxy.abs, sxx.abs))
        assert(m < cap62, s"$et moment exceeds 2^62 BIGINT headroom")
      // and the composed terms stay within int128, where the old
      // oracle computed them
      val cap127 = BigInt(2).pow(127)
      assert(num.abs < cap127 && den < cap127, s"$et int128 bound")
    }
  }
}
