package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-manifest scan pruning — the Iceberg/Delta data-skipping
  * pattern as a first-class operator: a write-once CLUSTERED layout
  * (range-partitioned by the skip key, so each file covers a tight
  * key range), a MANIFEST table of per-file min/max stats built once
  * from the layout, and a planner that answers a range predicate by
  * reading ONLY the files whose [min, max] interval overlaps it.
  *
  * This is the file-level complement of what the engine already
  * proves at other granularities (parquet row-group min/max inside a
  * file, hive-partition pruning in the IVF index, Z-order for
  * two-sided ranges): at 100 TB the planner's manifest scan is KBs
  * (one row per file), the file list is driver-held exactly like an
  * Iceberg planner's, and a selective range touches O(matching
  * files), not the table. Results are EXACT — the exact predicate is
  * re-applied after the pruned read, so a file that overlaps but
  * contains no matching row costs I/O, never correctness.
  */
object ManifestPrune {

  private val layoutCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  /** Write the clustered documents layout + its manifest once per
    * (session, sf dir); returns the layout root. `data/` holds the
    * range-partitioned files, `manifest/` one row per file:
    * (file, min_key, max_key, n_rows). */
  def ensureLayout(s: SparkSession, d: String): String =
    layoutCache.computeIfAbsent((s, d), { _ =>
      val root = graft.Tables.matDir("manifest_docs", s, d)
      graft.Tables.load(s, d, "documents")
        .repartitionByRange(8, col("n_chars"), col("doc_id"))
        .write.mode("overwrite").parquet(s"$root/data")
      s.read.parquet(s"$root/data")
        .select(col("_metadata.file_path").as("file"), col("n_chars"))
        .groupBy("file")
        .agg(min(col("n_chars")).as("min_key"),
          max(col("n_chars")).as("max_key"),
          count(lit(1)).as("n_rows"))
        .write.mode("overwrite").parquet(s"$root/manifest")
      root
    })

  /** Plan a range scan: the manifest names the files whose stats
    * interval overlaps [lo, hi]. Driver-held list, one row per file —
    * the same bounded state an Iceberg planner keeps. */
  def planFiles(s: SparkSession, root: String, lo: Long,
                hi: Long): Seq[String] =
    s.read.parquet(s"$root/manifest")
      .filter(col("min_key") <= hi && col("max_key") >= lo)
      .select("file").collect().map(_.getString(0)).toSeq

  /** Total file count in the layout (for the pruning assertion). */
  def totalFiles(s: SparkSession, root: String): Long =
    s.read.parquet(s"$root/manifest").count()

  /** The pruned range read: only planned files are opened; the exact
    * predicate is re-applied so overlap-but-no-match files cannot
    * leak rows. Returns an empty-schema'd frame when nothing
    * overlaps. */
  def readRange(s: SparkSession, root: String, lo: Long,
                hi: Long): DataFrame = {
    val files = planFiles(s, root, lo, hi)
    val base =
      if (files.isEmpty)
        s.read.parquet(s"$root/data").limit(0)
      else s.read.parquet(files: _*)
    base.filter(col("n_chars") >= lo && col("n_chars") <= hi)
  }

  /** COMPACTION — the maintenance sibling of the pruned scan: many
    * small files (the steady state of incremental ingest) are
    * rewritten into `nFiles` range-clustered files WITH a rebuilt
    * manifest, into a new versioned directory pair — the live layout
    * is never mutated in place, so concurrent readers of the old
    * data/manifest keep a consistent view (swap-by-path, the same
    * commit idea as the MV version pointer). Clustering is preserved
    * (repartitionByRange on the same key), so post-compaction skipping
    * is at least as selective per file. Returns the new layout's
    * (dataDir, manifestDir). */
  def compactLayout(s: SparkSession, root: String,
                    nFiles: Int): (String, String) = {
    val dataDir = s"$root/data_compact_$nFiles"
    val mfDir = s"$root/manifest_compact_$nFiles"
    s.read.parquet(s"$root/data")
      .repartitionByRange(nFiles, col("n_chars"), col("doc_id"))
      .write.mode("overwrite").parquet(dataDir)
    s.read.parquet(dataDir)
      .select(col("_metadata.file_path").as("file"), col("n_chars"))
      .groupBy("file")
      .agg(min(col("n_chars")).as("min_key"),
        max(col("n_chars")).as("max_key"),
        count(lit(1)).as("n_rows"))
      .write.mode("overwrite").parquet(mfDir)
    (dataDir, mfDir)
  }

  /** COPY-ON-WRITE MERGE — the lakehouse write path that completes the
    * manifest family (prune = read, compact = maintenance, merge =
    * mutation): fold an upsert batch into the layout by rewriting ONLY
    * the files that contain a matched key, exactly what Delta/Hudi
    * CoW MERGE does. Steps, all Iceberg-planner-shaped:
    *   1. plan: join the batch's keys against the layout once to find
    *      the HIT files — a driver-held file list (KBs: one row per
    *      touched file, never per row);
    *   2. rewrite: re-read only the hit files, apply the update
    *      (coalesce of the batch's new value over the old), append the
    *      insert rows, write to a NEW versioned data dir;
    *   3. commit: a NEW manifest referencing untouched files AT THEIR
    *      OLD PATHS plus the rewritten files — swap-by-path, so
    *      concurrent readers of the old manifest keep a consistent
    *      pre-merge view and nothing is mutated in place.
    * At 100 TB the cost is proportional to the TOUCHED data (hit
    * files + batch), not the table — the entire point of CoW over
    * rewrite-the-world. Caller contract (as in a real MERGE ... WHEN
    * MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT): `updates`
    * carries (doc_id, new_lang) for existing keys, `inserts` carries
    * full new rows with keys absent from the table. Returns
    * (dataV2Dir, manifestV2Dir). */
  def cowMerge(s: SparkSession, root: String, updates: DataFrame,
               inserts: DataFrame, version: String): (String, String) =
    cowMergeFrom(s, root, s"$root/manifest", updates, inserts, version)

  /** [[cowMerge]] against an arbitrary committed base manifest (the
    * commit-protocol entry point merges against the current one).
    * `deletes` (optional, key rows) completes the MERGE triad — WHEN
    * MATCHED THEN DELETE: deleted keys' files count as hit files and
    * the rewrite drops their rows (an anti-join inside the rewritten
    * subset only — copy-on-write deletion, the eager complement of
    * Delta/Iceberg deletion vectors, which defer the same anti-join
    * to read time). */
  def cowMergeFrom(s: SparkSession, root: String, baseManifest: String,
                   updates: DataFrame, inserts: DataFrame,
                   version: String,
                   deletes: Option[DataFrame] = None): (String, String) = {
    val dataV2 = s"$root/data_$version"
    val mfV2 = s"$root/manifest_$version"
    val table = readVersion(s, baseManifest)
    // 1. plan: which files hold a matched key? (driver-held, file-grain)
    val touchedKeys = deletes match {
      case Some(del) => updates.select("doc_id")
        .unionByName(del.select("doc_id"))
      case None => updates.select("doc_id")
    }
    val hitFiles = table
      .select(col("_metadata.file_path").as("file"), col("doc_id"))
      .join(touchedKeys, "doc_id")
      .select("file").distinct().collect().map(_.getString(0))
    // 2. rewrite hit files with updates applied and deletes dropped,
    //    then append inserts
    val hit =
      if (hitFiles.isEmpty) table.limit(0)
      else s.read.parquet(hitFiles.toIndexedSeq: _*)
    val afterDelete = deletes match {
      case Some(del) => hit.join(del.select("doc_id"), Seq("doc_id"),
        "left_anti")
      case None => hit
    }
    afterDelete
      .join(updates.withColumnRenamed("new_lang", "__nl"), Seq("doc_id"),
        "left")
      .withColumn("lang", coalesce(col("__nl"), col("lang")))
      .drop("__nl")
      .unionByName(inserts)
      .write.mode("overwrite").parquet(dataV2)
    // 3. commit: new manifest = untouched old rows + fresh v2 stats
    // (both sides carry _metadata.file_path URIs, so plain equality
    // works; an empty hit list keeps every old row)
    val untouched = s.read.parquet(baseManifest)
      .filter(if (hitFiles.isEmpty) lit(true)
        else !col("file").isInCollection(hitFiles.toIndexedSeq))
    val v2Stats = s.read.parquet(dataV2)
      .select(col("_metadata.file_path").as("file"), col("n_chars"))
      .groupBy("file")
      .agg(min(col("n_chars")).as("min_key"),
        max(col("n_chars")).as("max_key"),
        count(lit(1)).as("n_rows"))
    untouched.unionByName(v2Stats).write.mode("overwrite").parquet(mfV2)
    (dataV2, mfV2)
  }

  /** OPTIMISTIC CONCURRENCY for the swap-by-path commit — the ACID
    * piece that turns the versioned manifests into a real table
    * protocol (what Delta's `_delta_log/N.json` PUT-if-absent and
    * Iceberg's metadata-pointer CAS do): writers prepare data +
    * manifest under version N+1, then COMMIT by atomically creating
    * the commit marker `_commits/N+1` — exactly one writer can create
    * it, so two merges racing from the same base cannot both publish;
    * the loser gets a ConcurrentModificationException and must retry
    * on the new base (re-plan its hit files — its rewrite may be
    * stale). `currentVersion` follows the highest committed marker,
    * so readers always see a complete, winner-consistent view and
    * never a half-published one. Uncommitted prepared directories are
    * garbage, never truth — the crash-safety property the MV version
    * pointer established for the streaming leg. */
  def currentVersion(s: SparkSession, root: String): Long = {
    val dir = new java.io.File(s"$root/_commits")
    if (!dir.isDirectory) 0L
    else dir.list().filter(_.forall(_.isDigit)).map(_.toLong)
      .foldLeft(0L)(math.max)
  }

  /** Manifest dir of a committed version (0 = the base layout; the
    * `c` prefix keeps protocol versions apart from ad-hoc
    * [[cowMerge]] suffixes). */
  def manifestOf(root: String, version: Long): String =
    if (version == 0L) s"$root/manifest" else s"$root/manifest_c$version"

  /** [[cowMerge]] under the commit protocol: merges against the
    * CURRENT committed version and publishes the next one atomically.
    * Throws ConcurrentModificationException if another writer
    * committed first (caller retries against the new base). Returns
    * the committed version number. */
  def cowMergeCommit(s: SparkSession, root: String, updates: DataFrame,
                     inserts: DataFrame): Long = {
    val base = currentVersion(s, root)
    val next = base + 1
    cowMergeFrom(s, root, manifestOf(root, base), updates, inserts,
      s"c$next")
    if (!tryCommit(root, next))
      throw new java.util.ConcurrentModificationException(
        s"version $next already committed by another writer " +
          s"(base was $base); re-plan against the new base")
    next
  }

  /** The CAS primitive: atomic PUT-if-absent of the commit marker
    * (File.createNewFile — exactly one writer of `version` succeeds;
    * on object stores this is the conditional PUT / metadata swap). */
  def tryCommit(root: String, version: Long): Boolean = {
    val marker = new java.io.File(markerPath(root, version))
    marker.getParentFile.mkdirs()
    marker.createNewFile()
  }

  def markerPath(root: String, version: Long): String =
    s"$root/_commits/$version"

  /** Attach a note (e.g. the source batch id) to a committed marker —
    * written AFTER the CAS; the marker's existence is the commit, the
    * note is idempotency metadata for the writer that owns it. */
  def noteCommit(root: String, version: Long, note: String): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(markerPath(root, version)), note)

  def commitNote(root: String, version: Long): Option[String] = {
    val p = java.nio.file.Paths.get(markerPath(root, version))
    if (java.nio.file.Files.exists(p)) {
      val c = java.nio.file.Files.readString(p).trim
      if (c.nonEmpty) Some(c) else None
    } else None
  }

  /** Read the table a manifest version describes (the post-merge
    * reader: untouched files at their old paths + rewritten files). */
  def readVersion(s: SparkSession, manifestDir: String): DataFrame = {
    val files = s.read.parquet(manifestDir)
      .select("file").collect().map(_.getString(0))
    s.read.parquet(files.toIndexedSeq: _*)
  }

}
