package graft

import org.apache.spark.sql.SparkSession

/** Shared engine-session tuning applied by every graft main.
  *
  * AQE coalescing floor (guide §2.2/§2.5): Spark's
  * `coalescePartitions.minPartitionSize` defaults to 1 MB, which is a
  * BYTE heuristic — at gate scale most shuffles carry well under
  * 32 MB, so AQE folds CPU-heavy stages (generator fan-outs, window
  * ranks, pairwise verifies over exploded text) down to 1-2 tasks and
  * the query runs serial on a 32-core executor (q_dedup_ngram_jaccard
  * measured 3.6 s with EVERY stage at 1 task; 1.9 s with a 64 KB
  * floor). 64 KB keeps tiny frames coalesced while letting ~MB-scale
  * CPU-bound stages spread across cores. At production byte volumes
  * partitions sit far above either floor, so the setting is inert
  * there — it matters exactly where byte-based sizing misjudges
  * per-byte CPU cost. Parameterised (env) so cluster deployments can
  * retune without a rebuild; the local default keeps the driver's
  * bench methodology unchanged (same master/partitions contract).
  */
object SparkTune {
  def minPartitionSize: String =
    sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k")

  /** Apply shared tuning to a session builder. */
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      minPartitionSize)
}
