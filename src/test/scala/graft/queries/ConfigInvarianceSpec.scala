package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Partitioning/engine-config INVARIANCE: a battery query's rows must
  * be identical under a hostile re-configuration — shuffle parallelism
  * changed to a prime, AQE off, whole-stage codegen off (interpreted
  * expression path). This is the class of bug the exact-arithmetic
  * discipline exists to prevent (float partial-sum order, rand()-
  * seeded sampling, partition-dependent windows); a query that drifts
  * under any of these would also drift between local[32] and a
  * 1000-executor cluster — exactly where the oracle gate can't follow.
  * One representative per family keeps the suite fast. */
class ConfigInvarianceSpec extends SparkSpec {

  private val representatives = Seq(
    "q_agg_pricing",        // decimal money aggregation
    "q_stats_moments",      // exact second moments
    "q_dedup_exact",        // md5 hash-agg
    "q_dedup_minhash_lsh",  // banded join + verify
    "q_tfidf",              // windowed argmax + broadcast stats
    "q_global_ids",         // two-phase global rank
    "q_deterministic_sample", // md5-bucket sampling
    "q_bm25",               // integer ranking + TakeOrdered
    "q_bootstrap_ci",       // md5-driven replicate weights
    "q_quantiles",          // per-group exact order stats
    "q_asof_join",          // union + keyed window
    "q_window_rank",        // rank/dense_rank surface
    "q_t_closeness",        // class × domain grid + broadcasts
    "q_kmeans",             // broadcast-argmax Lloyd round
    "q_decay_score",        // shift-divide decay + TakeOrdered
    "q_dedup_simhash64",    // persisted pair table read-back
    "q_dv_delete",          // positional deletion-vector anti-join
    "q_manifest_tree",      // two-level shard-pruned planning
    "q_multimodal_mp4")     // recursive box-tree codec seam

  private def rows(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, sf0001)
      .collect().map(_.toSeq.map {
        case a: Array[_] => a.toSeq
        case x => x
      }.toSeq).toSeq

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  for (name <- representatives) {
    test(s"$name is invariant under shuffle=7 / AQE off / codegen off") {
      val baseline = rows(name)
      assert(baseline.nonEmpty)
      val hostile = withConf(
        "spark.sql.shuffle.partitions" -> "7",
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.codegen.wholeStage" -> "false") {
        rows(name)
      }
      assert(hostile === baseline,
        s"$name drifted under the hostile configuration")
    }
  }
}
