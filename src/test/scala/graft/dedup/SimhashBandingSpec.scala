package graft.dedup

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class SimhashBandingSpec extends SparkSpec {

  import SimhashBanding._

  test("blocks tile the 64 bits exactly, near-equal widths") {
    for (b <- 4 to 16) {
      val p = Plan(b, 3)
      assert(p.starts.head === 0 && p.starts.last === 64)
      val widths = (0 until b).map(p.width)
      assert(widths.sum === 64)
      assert(widths.max - widths.min <= 1, s"b=$b widths=$widths")
    }
  }

  test("combo count is C(b, r) and keys cover b-r blocks") {
    def c(n: Int, k: Int): Int =
      (1 to k).foldLeft(1L)((a, i) => a * (n - i + 1) / i).toInt
    for (b <- 4 to 10) {
      val p = Plan(b, 3)
      assert(p.combos.size === c(b, 3))
      assert(p.combos.forall(_.size == b - 3))
      assert(p.combos.distinct.size === p.combos.size)
    }
  }

  test("choose: battery scale keeps the minimal 4x16 split") {
    assert(choose(500).b === 4)
    assert(choose(0).b === 4)
    assert(choose(32768).b === 4)
  }

  test("choose: band width grows with corpus size") {
    // the scale schedule documented in the scaladoc
    val b1e6 = choose(1000000L)
    val b1e9 = choose(1000000000L)
    assert(b1e6.b > 4 && b1e6.b <= b1e9.b)
    assert(b1e9.b === 7)
    // the bound that makes it scale-safe: expected false-candidate
    // pairs stay within the corpus size (O(N) verify work)
    assert(b1e9.expectedFalsePairs(1000000000L) <= 1e9)
    assert(b1e6.expectedFalsePairs(1000000L) <= 1e6)
    // and the fixed 4x16 split really is quadratic there — the
    // failure mode the parameterization removes
    assert(Plan(4, 3).expectedFalsePairs(1000000000L) > 1e13)
  }

  test("losslessness: hamming<=3 pairs share a probe key at every width") {
    val gen = for {
      fp <- Gen.long
      k <- Gen.chooseNum(0, 3)
      flips <- Gen.listOfN(k, Gen.chooseNum(0, 63))
    } yield (fp, flips)
    for (b <- 4 to 9) {
      val plan = Plan(b, 3)
      var seed = Seed(20260813L + b)
      for (_ <- 1 to 200) {
        val (fp, flips) = gen.pureApply(Gen.Parameters.default, seed)
        seed = seed.next
        val other = flips.foldLeft(fp)((v, i) => v ^ (1L << i))
        val shared = probeKeys(fp, plan).toSet
          .intersect(probeKeys(other, plan).toSet)
        assert(shared.nonEmpty,
          s"b=$b fp=$fp flips=$flips lost a hamming<=3 pair")
      }
    }
  }

  test("probe keys differ for distant fingerprints (sanity, b=4)") {
    // all-ones vs all-zeros share no key — banding filters SOMETHING
    val p = Plan(4, 3)
    assert(probeKeys(0L, p).toSet.intersect(probeKeys(-1L, p).toSet).isEmpty)
  }

  test("every width yields the identical pair set end-to-end (Spark)") {
    // the whole point of corpus-parameterized banding: the width is a
    // COST knob, never a RESULT knob. Run the real banded join over
    // the real sf0.001 fingerprints at four widths and against the
    // brute-force all-pairs baseline — all five must agree exactly.
    import org.apache.spark.sql.functions._
    val fp = DedupQueries.fingerprints(spark, sf0001).cache()
    def pairSet(plan: Plan): Set[(Long, Long, Long)] =
      DedupQueries.bandedPairs(fp, plan).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = {
      val a = fp.select(col("doc_id").as("a_id"), col("hi").as("a_hi"),
        col("lo").as("a_lo"))
      val b = fp.select(col("doc_id").as("b_id"), col("hi").as("b_hi"),
        col("lo").as("b_lo"))
      a.join(b, col("a_id") < col("b_id"))
        .withColumn("hamming",
          (bit_count(col("a_hi").bitwiseXOR(col("b_hi"))) +
           bit_count(col("a_lo").bitwiseXOR(col("b_lo")))).cast("long"))
        .filter(col("hamming") <= 3)
        .select("a_id", "b_id", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(brute.nonEmpty, "fixture corpus has no near-dup pairs to test")
    for (b <- Seq(4, 5, 7, 9))
      assert(pairSet(Plan(b, 3)) === brute, s"b=$b diverged from brute force")
    fp.unpersist()
  }

  test("Catalyst probe construction matches the reference semantics") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // random (hi, lo) halves, both in [0, 2^32) like SimHash64Agg emits
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(64)((rnd.nextLong() >>> 32, rnd.nextLong() >>> 32))
    val df = rows.toDF("hi", "lo")
    for (b <- Seq(4, 7)) {
      val plan = Plan(b, 3)
      val fp64 = shiftleft(col("hi"), 32).bitwiseOR(col("lo"))
      def block(i: Int) =
        shiftrightunsigned(fp64, plan.starts(i))
          .bitwiseAND(lit(SimhashBanding.mask(plan.width(i))))
      val probes = plan.combos.zipWithIndex.map { case (combo, ci) =>
        val bits = combo.foldLeft(lit(0L)) { (acc, i) =>
          shiftleft(acc, plan.width(i)).bitwiseOR(block(i))
        }
        struct(lit(ci).as("comb"), bits.as("bits"))
      }
      val got = df
        .withColumn("p", explode(array(probes: _*)))
        .select(col("hi"), col("lo"),
          col("p.comb").as("comb"), col("p.bits").as("bits"))
        .collect()
        .groupBy(r => (r.getLong(0), r.getLong(1)))
        .map { case (k, rs) =>
          k -> rs.map(r => (r.getInt(2), r.getLong(3))).toSet
        }
      rows.foreach { case (hi, lo) =>
        val fp = (hi << 32) | lo
        assert(got((hi, lo)) === probeKeys(fp, plan).toSet,
          s"b=$b hi=$hi lo=$lo")
      }
    }
  }
}
