package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The O(n log n) TopN drop set must equal the quadratic definition
  * on every input — the reference below IS the old production loop
  * (per-candidate sum over all other files), kept here as the spec.
  * Pure driver arithmetic, no SparkSession. */
class TopNDropSetSpec extends AnyFunSuite {

  /** The previous production shape, verbatim semantics: for each
    * candidate, sum live lower bounds over all OTHER files whose
    * worst strictly beats the candidate's best. */
  private def quadraticReference(files: Seq[ChainSkip.TopNFile[Long]],
      ascending: Boolean, nullsFirst: Boolean, k: Int): Set[String] = {
    def best(f: ChainSkip.TopNFile[Long]) = if (ascending) f.lo else f.hi
    def worst(f: ChainSkip.TopNFile[Long]) = if (ascending) f.hi else f.lo
    def beats(w: Long, b: Long) = if (ascending) w < b else w > b
    files.filter { f =>
      f.usable && f.rows > 0 && best(f).isDefined &&
        (!nullsFirst || f.nulls.contains(0L)) && {
          val beaten = files.iterator.filter { g =>
            g.usable && (g ne f) && worst(g).isDefined &&
              beats(worst(g).get, best(f).get)
          }.map(g => (g.rows - g.nulls.getOrElse(g.rows) -
            g.hidden).max(0L)).sum
          beaten >= k
        }
    }.map(_.file).toSet
  }

  private def randomFiles(rng: scala.util.Random, n: Int,
                          valueSpan: Long)
      : Seq[ChainSkip.TopNFile[Long]] =
    (0 until n).map { i =>
      // small value span on purpose: identical and overlapping
      // [lo, hi] ranges are the tie cases the strict rule exists for
      val a = rng.nextLong(valueSpan)
      val b = rng.nextLong(valueSpan)
      val rows = rng.nextLong(50) + 1
      val nulls =
        if (rng.nextInt(4) == 0) None
        else Some(rng.nextLong(rows + 1).min(rows))
      ChainSkip.TopNFile(
        file = s"f$i",
        lo = if (rng.nextInt(10) == 0) None else Some(a.min(b)),
        hi = if (rng.nextInt(10) == 0) None else Some(a.max(b)),
        rows = rows,
        nulls = nulls,
        hidden = rng.nextLong(5),
        usable = rng.nextInt(8) != 0)
    }

  test("matches the quadratic reference on 400 random manifests " +
      "across directions, null orders and k") {
    val rng = new scala.util.Random(20260816L)
    for (trial <- 0 until 400) {
      val files = randomFiles(rng, n = rng.nextInt(60) + 1,
        valueSpan = rng.nextInt(12) + 1)
      val asc = rng.nextBoolean()
      val nf = rng.nextBoolean()
      val k = rng.nextInt(40) + 1
      val fast = ChainSkip.topNDropSet(files, asc, nf, k)
      val slow = quadraticReference(files, asc, nf, k)
      assert(fast == slow,
        s"trial=$trial asc=$asc nullsFirst=$nf k=$k " +
          s"fast-only=${(fast -- slow).take(3)} " +
          s"slow-only=${(slow -- fast).take(3)}")
    }
  }

  test("corrupt row (hi < lo) never self-beats: a lone inverted file " +
      "is kept, matching the old self-exclusion") {
    val f = ChainSkip.TopNFile("bad", lo = Some(100L), hi = Some(0L),
      rows = 1000L, nulls = Some(0L), hidden = 0L, usable = true)
    assert(ChainSkip.topNDropSet(Seq(f), ascending = true,
      nullsFirst = false, k = 10) === Set.empty)
    assert(ChainSkip.topNDropSet(Seq(f), ascending = false,
      nullsFirst = false, k = 10) === Set.empty)
  }

  test("100k synthetic files: plans in well under a second and drops " +
      "everything past the provable top-k prefix") {
    val n = 100000
    // disjoint unit ranges in file order: file i holds values [2i,
    // 2i+1], 10 live rows each, no nulls — ASC k=25 provably needs
    // only the first 3 files (ceil(25/10)), every later file has
    // >= 30 rows strictly before its best
    val files = (0 until n).map { i =>
      ChainSkip.TopNFile(f"f$i%06d", Some(2L * i), Some(2L * i + 1),
        rows = 10L, nulls = Some(0L), hidden = 0L, usable = true)
    }
    val t0 = System.nanoTime()
    val dropped = ChainSkip.topNDropSet(files, ascending = true,
      nullsFirst = false, k = 25)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(dropped.size === n - 3, s"kept ${n - dropped.size} files")
    assert(!dropped.contains("f000000") && !dropped.contains("f000002"))
    assert(dropped.contains("f000003"))
    // the O(n^2) shape took minutes here; the sort path is
    // milliseconds — a loose ceiling that only a complexity
    // regression can breach, not a host-speed assertion
    assert(ms < 5000.0, s"topNDropSet took $ms ms at 100k files")
  }

  test("string bounds compare in UTF8-binary order, not UTF-16: a " +
      "supplementary char sorts ABOVE U+FFFF (java compareTo says " +
      "the opposite — surrogates sort low)") {
    val smiley = new String(Character.toChars(0x1F600))
    assert(smiley.compareTo("￿") < 0) // the UTF-16 trap
    assert(ChainSkip.utf8Ordering.gt(smiley, "￿"))
    // drop-set consequence (DESC: biggest first, k=1): the smiley
    // file beats the ￿ file — correct only under UTF8 order
    val fs = Seq(
      ChainSkip.TopNFile("hi", Some(smiley), Some(smiley), 5L,
        Some(0L), 0L, usable = true),
      ChainSkip.TopNFile("lo", Some("￿"), Some("￿"), 5L,
        Some(0L), 0L, usable = true))
    val dropped = ChainSkip.topNDropSet(fs, ascending = false,
      nullsFirst = false, k = 1)(ChainSkip.utf8Ordering)
    assert(dropped === Set("lo"))
  }
}
