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
      // keep the legacy nanos handling scoped to THIS scan, never
      // spark.conf.set: an explicit schema skips driver-side inference
      // (which would consult the session conf and reject NANOS), and
      // the read option lands in this relation's hadoopConf
      // (newHadoopConfWithOptions) where the executor-side footer
      // conversion (ParquetReadSupport) picks it up
      spark.read
        .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .option("spark.sql.legacy.parquet.nanosAsLong", "true")
        .parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
}
