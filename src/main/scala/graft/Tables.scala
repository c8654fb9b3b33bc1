package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-generated testdata
  * (see /root/repo/TESTDATA.md). One parquet file per table under
  * `sfDir`. Explicit-path loads keep Catalyst's parquet pushdown
  * (predicate + column pruning) fully effective.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
  * reader rejects ([PARQUET_TYPE_ILLEGAL]); we read it as a raw
  * nanosecond long (legacy conf) and rebuild a TimestampType column.
  * The testdata has zero sub-microsecond content (verified: ns%1000==0
  * for every row), so `ts div 1000` is lossless and `div` (integer
  * division) avoids the double round-trip that would corrupt 1.7e18-ns
  * epochs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // the explicit schema is the whole mechanism, scoped to THIS scan
      // (never spark.conf.set): it skips driver-side inference (which
      // would reject NANOS) and its LongType for `ts` reaches the
      // executor-side parquet converter as a sparkReadType hint, so the
      // NANOS column decodes as a raw long. (A per-read
      // nanosAsLong option would NOT work: ParquetFileFormat overwrites
      // that hadoopConf key from the session conf before broadcast.)
      spark.read
        .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** target/tmp materialization dir for write-once artifacts, keyed by
    * (kind, sf dir, session identity) so concurrent sessions and sf
    * scales never collide — the ONE path scheme every persisted stage
    * (dedup pair/fingerprint tables, pricing MV, manifest layout, IVF
    * index) uses; a change to sanitization or session-keying lands
    * everywhere at once. */
  def matDir(kind: String, spark: SparkSession, sfDir: String): String =
    s"/root/repo/target/tmp/${kind}_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_") + "_" +
      java.lang.Integer.toHexString(System.identityHashCode(spark))
}
