package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic two-phase global rank / prefix-sum scaffolding.
  *
  * The naive `row_number() OVER (ORDER BY key)` funnels the whole
  * table through one task. The scale shape is two-phase: partition by
  * key range, compute per-partition totals (a tiny frame), broadcast
  * the prefix-summed offsets back, and finish with a PARTITION-LOCAL
  * window. The first cut of that shape used `repartitionByRange` +
  * `spark_partition_id()` — and carried a latent consistency hazard
  * the sf1 oracle rung caught as duplicate global ids: the offsets
  * branch and the ranking branch each RE-EXECUTE the exchange, and
  * Spark's RangePartitioner re-samples imbalanced partitions with a
  * seed derived from the RDD id, which differs per execution. At gate
  * scale the resample path never triggers and the two executions
  * agree; one decade up they disagreed, and rows were counted against
  * one set of boundaries but ranked against another.
  *
  * The repair makes bucket assignment a PURE FUNCTION of the row:
  * boundaries are sampled ONCE, driver-side (a bounded collect:
  * ~200 keys per bucket with a fixed seed), sorted with the same
  * comparator Spark uses (unsigned UTF-8 bytes for strings — NOT
  * java.lang.String order, which diverges on supplementary planes),
  * and embedded in the plan as literals. Every re-execution of any
  * branch then assigns identical buckets, whatever the scheduler or
  * sampler does. Buckets outnumber target partitions 4× so the hash
  * distribution of bucket ids stays balanced; empty or duplicated
  * boundary values only merge buckets, never reorder them. */
object GlobalRank {

  val BucketCol = "__bkt"
  val OffCol = "__off"

  /** Stamp `df` with a deterministic range-bucket id over `key`
    * (monotone: bucket(x) <= bucket(y) whenever x <= y under Spark's
    * ordering), then hash-repartition on it. `n` is the caller's row
    * count for sizing the boundary sample — pass the cheap base-table
    * count, not a count of a derived frame. For string keys pass a
    * bounded prefix (e.g. `substring(col, 1, 64)`) so the sampled
    * boundary literals stay small; prefix bucketing is order-safe
    * because distinct prefixes decide the full comparison and equal
    * prefixes share a bucket. */
  def bucketed(df: DataFrame, parts: Int, key: Column, n: Long): DataFrame = {
    val buckets = 4 * parts
    val frac =
      math.min(1.0, buckets * 200.0 / math.max(1L, n).toDouble)
    // sample ROWS first, then compute the key on the survivors only:
    // the key may be expensive (tokenize, substring over full text),
    // and the boundary job should pay it on ~200·buckets rows, not
    // the corpus. Boundaries are literals either way, so output ranks
    // are invariant to where the sample lands.
    val sampled = df.sample(withReplacement = false, frac, seed = 42L)
      .select(key.as("__k"))
      .collect().map(_.get(0)).filter(_ != null)
    val sorted = sortAsSpark(sampled)
    val step = sorted.length.toDouble / buckets
    val bounds: Seq[Any] = (1 until buckets)
      .map(i => sorted(math.min(sorted.length - 1, (i * step).toInt)))
      .distinct
    // balanced binary-search when-tree over the sorted distinct
    // bounds: bucket = #{i : bounds(i) <= key} (upper_bound), the same
    // count the old `foldLeft(when(key >= b, 1))` chain computed — but
    // depth log2(n) instead of a 127-deep nested Add chain, so rows
    // pay ~7 comparisons instead of 128 and Catalyst/codegen stop
    // crawling a pathological tree (the chain showed up as ~100s of ms
    // of pure driver plan time in every GlobalRank consumer). Null
    // keys fall through every >= to the left edge = bucket 0, exactly
    // as the old chain's `otherwise(0)` did.
    def bktTree(lo: Int, hi: Int): Column =
      if (lo >= hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(key >= lit(bounds(mid)), bktTree(mid + 1, hi))
          .otherwise(bktTree(lo, mid))
      }
    val bkt = if (sorted.isEmpty) lit(0) else bktTree(0, bounds.length)
    df.withColumn(BucketCol, bkt).repartition(parts, col(BucketCol))
  }

  /** The tiny broadcastable offset frame: per-bucket `agg`, prefix-
    * summed EXCLUSIVE of the bucket itself. The single-partition
    * window is over at most `4 * parts` rows. */
  def offsets(bucketedDf: DataFrame, agg: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bucketedDf.groupBy(BucketCol).agg(agg.as("__psum"))
      .withColumn(OffCol,
        coalesce(sum(col("__psum")).over(
          Window.orderBy(BucketCol)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(BucketCol), col(OffCol))
  }

  /** Contiguous exact global rank 1..n of `df` under `order` (which
    * must totally order rows — include a unique tiebreaker). One
    * bounded driver collect, one shuffle, one broadcast join, one
    * partition-local window; no single-partition data window, no
    * cross-execution boundary hazard. */
  def withRank(df: DataFrame, parts: Int, bucketKey: Column,
               order: Seq[Column], rankName: String, n: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = bucketed(df, parts, bucketKey, n)
    b.join(broadcast(offsets(b, count(lit(1)))), BucketCol)
      .withColumn(rankName,
        row_number().over(
          Window.partitionBy(BucketCol).orderBy(order: _*))
          + col(OffCol))
      .drop(BucketCol, OffCol)
  }

  /** Driver-side sort matching Spark's UTF8_BINARY / natural numeric
    * ordering, so boundary literals are monotone under the SAME
    * comparator the generated `key >= boundary` predicates use. */
  private def sortAsSpark(xs: Array[Any]): Array[Any] = xs.sortWith {
    case (a: String, b: String) => utf8Lt(a, b)
    case (a: Long, b: Long)     => a < b
    case (a: Int, b: Int)       => a < b
    case (a: Short, b: Short)   => a < b
    case (a: Double, b: Double) => a < b
    case (a: Float, b: Float)   => a < b
    case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
      a.compareTo(b) < 0
    case (a, b) => utf8Lt(a.toString, b.toString)
  }

  private def utf8Lt(a: String, b: String): Boolean = {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val lim = math.min(ab.length, bb.length)
    while (i < lim && ab(i) == bb(i)) i += 1
    if (i < lim) (ab(i) & 0xff) < (bb(i) & 0xff)
    else ab.length < bb.length
  }
}
