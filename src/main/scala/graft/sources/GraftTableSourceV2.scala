package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** STREAMING (and batch) READ of a versioned graft table's CHANGE
  * FEED — `spark.readStream.format("graft-table").load(root)`, the
  * consumption API every real CDC pipeline runs on (Delta's
  * `readChangeFeed` / Iceberg's changelog scan as a source):
  *
  *   - OFFSETS ARE VERSION IDS. The chain's commit markers are the
  *     offset log — the same reuse the graft-tsv source makes of the
  *     sink's epoch ledger: an offset is "highest version consumed",
  *     a micro-batch (start, end] is exactly the per-version feeds of
  *     the versions committed in that window, and a reader can never
  *     observe a half-published version (its marker doesn't exist
  *     until the manifest rename won). Restart replays nothing: the
  *     watermark lives in the reading query's checkpoint.
  *   - ADMISSION CONTROL caps versions per micro-batch
  *     (`maxVersionsPerTrigger`), so a consumer catching up on a long
  *     chain backlog takes bounded steps (the TsvMicroBatchStream
  *     pattern, verbatim).
  *   - Each version step is SPILLED ONCE to `root/_cdc/<key>/v<N>/`
  *     parquet
  *     (computed by [[ManifestPrune.changeFeedStep]] at plan time,
  *     published by atomic rename so concurrent readers share one
  *     spill), and partitions are the spilled files — the per-step
  *     compute cost is O(the commit's touched files) paid once per
  *     version across ALL consumers, and executors read plain parquet.
  *     The spill is a cache, not truth: deleting `_cdc` is always
  *     safe while the step's manifests are unexpired.
  *
  * Read options: `startingVersion` (first version whose changes are
  * emitted; default 1), `maxVersionsPerTrigger`, `key` (the merge key
  * the feed diffs on; default doc_id), `fromVersion`/`toVersion`
  * (batch-read window, default (0, head]).
  *
  * Rows carry the feed convention: `op` ∈ insert | update_preimage |
  * update_postimage | delete, the table's columns, and `version`. */
class GraftTableSourceV2 extends TableProvider with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSinkProvider {
  override def shortName(): String = "graft-table"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTableSourceV2.feedSchema(SparkSession.active,
      options.get("path"))
  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GraftTableTable(schema, new CaseInsensitiveStringMap(properties))

  /** STREAMING WRITE face —
    * `df.writeStream.format("graft-table").option("mode", …)
    * .start(root)`: each micro-batch commits as one version on the
    * chain (append / upsert-by-key / equality-delete, exactly-once
    * under replay via the `tsink:` marker cursor). The V1 Sink API is
    * deliberate — the driver-side batch frame is exactly what the
    * chain's commit functions consume, and the CAS protocol already
    * provides the atomicity a staged V2 write would re-implement
    * (the same call Delta makes). */
  override def createSink(sqlContext: org.apache.spark.sql.SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val root = parameters.getOrElse("path", throw new
        IllegalArgumentException("graft-table sink needs .start(<root>)"))
    new GraftTableSink(root,
      parameters.getOrElse("mode", "append"),
      parameters.getOrElse("key", "doc_id"))
  }
}

private[sources] class GraftTableSink(root: String, mode: String,
                                      key: String)
    extends org.apache.spark.sql.execution.streaming.Sink {
  override def name(): String = s"graft-table-sink:$root"
  override def addBatch(batchId: Long,
                        data: org.apache.spark.sql.DataFrame): Unit = {
    // the V1 batch frame is streaming-flagged and refuses .write;
    // rewrap it as a non-streaming LogicalRDD over the executed
    // micro-batch — exactly what Spark's own ForeachBatchSink does
    graft.streaming.StreamingPipelines.applySinkBatch(
      org.apache.spark.sql.GraftSqlShims.unstream(data),
      batchId, root, mode, key)
  }
}

object GraftTableSourceV2 {

  /** op + the table's current columns + version — the
    * [[ManifestPrune.changeFeedStep]] row shape. */
  def feedSchema(s: SparkSession, root: String): StructType = {
    require(root != null, "graft-table needs .load(<table root>)")
    val cur = ManifestPrune.currentVersion(s, root)
    val cols = ManifestPrune
      .readVersion(s, ManifestPrune.manifestOf(root, cur)).schema
    StructType(StructField("op", StringType, nullable = false) +:
      cols.fields :+
      StructField("version", LongType, nullable = false))
  }

  /** Spill one version step's feed to `root/_cdc/<key>/v<v>/`, once:
    * compute to a writer-unique temp dir, publish by atomic rename
    * (losers of a concurrent race delete their temp and adopt the
    * winner's spill), mark complete with `_FEED_READY` so a reader
    * never lists a half-written spill. Returns the spilled part
    * files. Idempotent across queries and JVMs. The spill path is
    * keyed by BOTH version and the merge `key` read option: the
    * spilled rows depend on the key (changeFeedStep pairs
    * update_preimage/postimage by it), so two readers diffing on
    * different keys must never adopt each other's spills. */
  def spillStep(s: SparkSession, root: String, v: Long,
                key: String): Seq[String] = {
    require(key.nonEmpty && key.forall(c => c.isLetterOrDigit || c == '_'),
      s"merge key must be a plain column name, got '$key'")
    val dir = new java.io.File(s"$root/_cdc/$key/v$v")
    val ready = new java.io.File(dir, "_FEED_READY")
    if (!ready.isFile) {
      new java.io.File(s"$root/_cdc/$key").mkdirs()
      val tmp = new java.io.File(
        s"$root/_cdc/$key/.tmp_v${v}_${ManifestPrune.prepareToken()}")
      ManifestPrune.changeFeedStep(s, root, v, key)
        .coalesce(2).write.mode("overwrite").parquet(tmp.getPath)
      // the marker must exist INSIDE the dir before the rename makes
      // it visible, so a competing reader that sees the dir also sees
      // the marker (rename is the publication point)
      new java.io.File(tmp, "_FEED_READY").createNewFile()
      if (!tmp.renameTo(dir)) {
        deleteRec(tmp)
        // the winner's rename is atomic and carries the marker; a
        // missing marker after a failed rename means the dir is NOT a
        // spill (corrupt leftovers) — fail loudly rather than read it
        require(ready.isFile,
          s"feed spill $dir exists without its _FEED_READY marker — " +
            "remove the directory and retry")
      }
    }
    partFiles(dir)
  }

  private[sources] def partFiles(dir: java.io.File): Seq[String] =
    dir.listFiles().toSeq
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .map(_.getPath).sorted

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }
}

private[sources] class GraftTableTable(userSchema: StructType,
                                       options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-table:${options.get("path")}"
  override def schema(): StructType = userSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = {
        // scan options override table options
        val merged = new java.util.HashMap[String, String](
          options.asCaseSensitiveMap())
        merged.putAll(opts.asCaseSensitiveMap())
        new GraftTableScan(userSchema, merged)
      }
    }
}

private[sources] class GraftTableScan(schema: StructType,
                                      options: java.util.Map[String, String])
    extends Scan with Batch {
  private def opt(k: String): Option[String] = {
    // CaseInsensitiveStringMap lower-cases keys
    val m = new CaseInsensitiveStringMap(options)
    Option(m.get(k))
  }
  private val root = opt("path").getOrElse(
    throw new IllegalArgumentException("graft-table needs a path"))
  private val key = opt("key").getOrElse("doc_id")

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-table $root key=$key"

  /** Batch read: the feed over (fromVersion, toVersion], default the
    * whole chain — the same rows [[ManifestPrune.changeFeed]]
    * computes, through the shared spill. */
  override def planInputPartitions(): Array[InputPartition] = {
    val s = SparkSession.active
    val lo = opt("fromVersion").map(_.toLong).getOrElse(0L)
    val hi = opt("toVersion").map(_.toLong)
      .getOrElse(ManifestPrune.currentVersion(s, root))
    (lo + 1 to hi).flatMap(v =>
        GraftTableSourceV2.spillStep(s, root, v, key))
      .map(f => FeedFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FeedParquetReaderFactory(
      new SerializableHadoopConf(
        SparkSession.active.sparkContext.hadoopConfiguration), schema)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftTableMicroBatchStream(root, schema, key,
      opt("startingVersion").map(_.toLong).getOrElse(1L),
      opt("maxVersionsPerTrigger").map(_.toInt),
      new SerializableHadoopConf(
        SparkSession.active.sparkContext.hadoopConfiguration))
}

private[sources] case class GraftVersionOffset(v: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = v.toString
}

private[sources] case class FeedFilePartition(file: String)
    extends InputPartition

private[sources] class GraftTableMicroBatchStream(
    root: String, schema: StructType, key: String,
    startingVersion: Long, maxVersionsPerTrigger: Option[Int],
    conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private def head: Long =
    ManifestPrune.currentVersion(SparkSession.active, root)

  // Trigger.AvailableNow pins the chain head at query start: batches
  // keep honoring maxVersionsPerTrigger and the query stops once the
  // pinned head is consumed (without this, Spark falls back to one
  // giant batch and ignores the read limit)
  private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(head)

  override def initialOffset(): Offset =
    GraftVersionOffset(math.max(0L, startingVersion - 1))
  override def latestOffset(): Offset = GraftVersionOffset(head)
  override def reportLatestOffset(): Offset = GraftVersionOffset(head)

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(startOffset: Offset,
                            limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[GraftVersionOffset].v
    val hi = availableNowCap.getOrElse(head)
    val capped = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        math.min(hi, start + m.maxFiles())
      case _ => hi
    }
    GraftVersionOffset(math.max(start, capped))
  }

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[GraftVersionOffset].v
    val hi = end.asInstanceOf[GraftVersionOffset].v
    val s = SparkSession.active
    (lo + 1 to hi).flatMap(v =>
        GraftTableSourceV2.spillStep(s, root, v, key))
      .map(f => FeedFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FeedParquetReaderFactory(conf, schema)
}

/** Executor-side reader of the spilled feed parquet via
  * parquet-hadoop's Group API ([[GroupParquet]] — no Spark-internal
  * reader classes): fields resolve by name, flat primitives only. */
private[sources] class FeedParquetReaderFactory(
    conf: SerializableHadoopConf, schema: StructType)
    extends PartitionReaderFactory {
  import org.apache.parquet.example.data.Group

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val reader = GroupParquet.open(
      p.asInstanceOf[FeedFilePartition].file, conf.value)
    new PartitionReader[InternalRow] {
      private var cur: Group = _
      override def next(): Boolean = { cur = reader.read(); cur != null }
      override def get(): InternalRow = GroupParquet.decode(cur, schema)
      override def close(): Unit = reader.close()
    }
  }
}
