package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Misra-Gries sketch: the superset guarantee (every item with
  * frequency > N/(k+1) survives the merged sketch) must hold under
  * adversarial skew, tiny k, and any partitioning — that guarantee is
  * what lets q_heavy_hitters hash-gate a sketch plan against a plain
  * GROUP BY oracle. */
class MisraGriesAggSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed stream: token "hh_i" appears freq(i) times. */
  private def stream(freqs: Map[String, Int]): Seq[String] =
    freqs.toSeq.sortBy(_._1).flatMap { case (t, n) => Seq.fill(n)(t) }

  private def sketch(data: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    val rows = spark.sparkContext.parallelize(data, parts).toDF("tok")
      .agg(MisraGriesAgg.misraGries(col("tok"), k).as("sk"))
      .head().getSeq[Row](0)
    rows.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("exact when k >= distinct items") {
    val freqs = Map("a" -> 5, "b" -> 3, "c" -> 1)
    val got = sketch(stream(freqs), k = 8, parts = 3)
    assert(got == freqs.map { case (t, n) => t -> n.toLong })
  }

  test("superset guarantee under skew, small k, many partitionings") {
    // 2 dominant tokens + 60 rare ones; N = 2*400 + 60*5 = 1100.
    // k = 4: threshold N/(k+1) = 220 — both dominants MUST survive.
    val freqs = Map("big1" -> 400, "big2" -> 400) ++
      (1 to 60).map(i => f"rare$i%02d" -> 5).toMap
    val n = freqs.values.sum
    val data = stream(freqs)
    for (parts <- Seq(1, 3, 8, 16)) {
      val got = sketch(data, k = 4, parts = parts)
      assert(got.size <= 4, s"parts=$parts: sketch exceeded k")
      for ((t, c) <- freqs if c > n / 5) {
        assert(got.contains(t), s"parts=$parts: heavy hitter $t evicted")
        // estimate underestimates by at most N/(k+1)
        assert(got(t) <= c && got(t) >= c - n / 5,
          s"parts=$parts: estimate ${got(t)} outside [c - N/(k+1), c] for $t")
      }
    }
  }

  test("interleaved order (worst case for decrement-all) keeps guarantee") {
    // alternate heavy and rare tokens so decrements hit constantly
    val heavy = Seq.fill(300)("hh")
    val rare = (1 to 300).map(i => f"r$i%03d")
    val data = heavy.zip(rare).flatMap { case (a, b) => Seq(a, b) }
    val n = data.size // 600; k=2 -> threshold 200
    val got = sketch(data, k = 2, parts = 5)
    assert(got.contains("hh"), "interleaved heavy hitter evicted")
    assert(got("hh") >= 300 - n / 3)
  }

  test("property: superset guarantee on 60 random Zipf-ish streams") {
    // random streams x random k x random partitioning, checked against
    // exact counts — the guarantee q_heavy_hitters' determinism rests
    // on must hold for ANY input, not just the crafted cases above
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      vocab <- Gen.choose(3, 40)
      n <- Gen.choose(50, 2000)
      k <- Gen.choose(2, 12)
      parts <- Gen.choose(1, 9)
      toks <- Gen.listOfN(n,
        // Zipf-ish skew: token i with weight ~ 1/(i+1)
        Gen.frequency((1 to vocab).map(i => (vocab / i, Gen.const(f"t$i%02d"))): _*))
    } yield (toks, k, parts)
    var seed = Seed(20260812L)
    for (_ <- 1 to 60) {
      val (toks, k, parts) = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val got = sketch(toks, k, parts)
      assert(got.size <= k, s"k=$k parts=$parts: sketch exceeded k")
      val thr = toks.size.toDouble / (k + 1)
      for ((t, c) <- exact if c > thr) {
        assert(got.contains(t),
          s"k=$k parts=$parts n=${toks.size}: heavy hitter $t (c=$c, thr=$thr) evicted")
        assert(got(t) <= c && got(t) >= c - thr,
          s"k=$k parts=$parts: estimate ${got(t)} outside bounds for $t (c=$c)")
      }
    }
  }

  test("nulls ignored; empty input yields empty sketch") {
    val got = Seq[Option[String]](None, Some("x"), None).toDF("tok")
      .agg(MisraGriesAgg.misraGries(col("tok"), 4).as("sk"))
      .head().getSeq[Row](0)
    assert(got.map(r => (r.getString(0), r.getLong(1))) == Seq(("x", 1L)))
    val empty = Seq.empty[String].toDF("tok")
      .agg(MisraGriesAgg.misraGries(col("tok"), 4).as("sk"))
      .head().getSeq[Row](0)
    assert(empty.isEmpty)
  }

  test("sketch pass plans partial ObjectHashAggregate (map-side combine)") {
    // the scale claim: one k-entry sketch per partition crosses the
    // wire. TypedImperativeAggregate plans as ObjectHashAggregate with
    // a partial phase before the exchange and a merge phase after.
    val df = spark.sparkContext.parallelize(Seq("a", "b", "a"), 3).toDF("tok")
      .agg(MisraGriesAgg.misraGries(col("tok"), 4).as("sk"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"sketch aggregate lost its partial phase:\n$plan")
  }

  test("q_heavy_hitters end-to-end output is partitioning-independent") {
    // the gated query's determinism claim: final output (exact recount
    // over candidates, thresholded) is identical however the corpus is
    // partitioned, even when the sketch content differs
    val q = graft.SparkEntry.queries("q_heavy_hitters")
    val base = q(spark, sf0001).collect().toSeq
    assert(base.nonEmpty)
    val conf = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(q(spark, sf0001).collect().toSeq == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", conf)
  }
}
