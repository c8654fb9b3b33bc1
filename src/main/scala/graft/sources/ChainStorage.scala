package graft.sources

/** STORAGE SEAM for the version chain's metadata protocol — the
  * abstraction that separates WHAT the commit protocol needs from
  * WHERE a table lives. Everything [[ManifestPrune]] does to publish,
  * discover, and retire versions goes through this trait; the DATA
  * files themselves are read/written by Spark (whose Hadoop
  * FileSystem layer already speaks HDFS/S3/GCS), so the seam only has
  * to carry the small-metadata protocol: commit markers, pointer
  * riders, tags, specs, constraints, cursors, and the atomic publish.
  *
  * The contract is deliberately OBJECT-STORE SHAPED (what Delta's
  * LogStore and Iceberg's FileIO abstract for the same reason):
  *
  *   - [[putIfAbsent]] is the one CAS primitive the whole protocol
  *     reduces to — a conditional PUT (S3 `If-None-Match`, GCS
  *     `ifGenerationMatch=0`, local `File.createNewFile`). Exactly
  *     one concurrent writer of a path succeeds.
  *   - [[publishDir]] makes a COMPLETE prepared directory visible
  *     under its canonical name, with exactly one concurrent
  *     publisher winning. Local filesystems get this from one atomic
  *     rename; object stores (no rename) implement it as a
  *     putIfAbsent CLAIM on the canonical name followed by an object
  *     copy and a completeness rider — which is why callers must
  *     gate on [[isPublished]], never on bare existence: a claimed
  *     name whose copy is still in flight exists but is not truth.
  *   - Commit TIMESTAMPS are protocol content, not filesystem
  *     metadata: [[ManifestPrune.tryCommit]] writes `ts=<millis>`
  *     INSIDE the marker (monotonic by construction), so time travel
  *     never depends on mtime fidelity — object stores don't have
  *     mtimes a rename preserves, and HDFS mtimes are not a
  *     timeline. [[modifiedMs]] survives only as the ADVISORY age
  *     check vacuum's grace window uses (object stores expose object
  *     creation time for the same purpose).
  *
  * Implementations are registered per path prefix
  * ([[ChainStorage.register]]); [[ChainStorage.forPath]] resolves the
  * longest registered prefix and defaults to the local filesystem, so
  * every existing `root: String` API keeps working unchanged while a
  * test (or a real object-store binding) mounts different semantics
  * under a prefix. ChainStorageContractSpec drives the WHOLE commit
  * protocol through [[InMemoryObjectStorage]] — no atomic rename, no
  * mtimes, list-after-put visibility — and proves CAS publication,
  * crash adoption, and `versionAsOf` hold on the trait contract
  * alone. */
trait ChainStorage {

  /** Child names (files and directories) of `dir`, or empty when the
    * path is absent. Object stores: one-level prefix listing. */
  def list(dir: String): Seq[String]

  /** Is there a directory (local) / any object under the prefix
    * (object store) at `path`? Existence only — see [[isPublished]]
    * for the visibility gate publish-protocol callers need. */
  def isDir(path: String): Boolean

  def isFile(path: String): Boolean

  def read(path: String): String

  /** Create-or-overwrite a small metadata object. Single-object
    * overwrite is atomic on every real store (PUT replaces). */
  def write(path: String, content: String): Unit

  /** Atomic PUT-if-absent — the CAS primitive: exactly one concurrent
    * writer of `path` succeeds; the rest observe `false`. */
  def putIfAbsent(path: String, content: String): Boolean

  /** PUT-if-absent for a directory NAME (branch/clone creation).
    * Object stores have no directories; an impl may model it as a
    * putIfAbsent marker object under the prefix. */
  def mkdirsExclusive(path: String): Boolean

  def mkdirs(path: String): Unit

  def deleteFile(path: String): Boolean

  /** Recursive delete; false when nothing existed. */
  def deleteTree(path: String): Boolean

  def copyFile(src: String, dst: String): Unit

  /** Publish a COMPLETE prepared dir at `canonical`: exactly one
    * concurrent publisher of a canonical name returns true. Local:
    * one atomic rename. Object store: putIfAbsent claim + copy +
    * completeness rider (see [[isPublished]]). */
  def publishDir(prepared: String, canonical: String): Boolean

  /** Has `canonical` been COMPLETELY published (or directly written,
    * for dirs that never went through [[publishDir]], e.g. a base
    * layout)? This is the existence check every read of a manifest
    * dir must use: under copy-based publication a half-copied dir
    * exists without being truth. */
  def isPublished(path: String): Boolean

  /** Is a publish of `canonical` CLAIMED but not yet complete? Local
    * rename can never observe this state (always false); an
    * object-store impl reports an in-flight copy so the commit
    * protocol can classify the race as retryable. */
  def isPending(path: String): Boolean

  /** Advisory age of a PENDING publish's claim — when the claim on
    * `path` was taken, so vacuum can distinguish an in-flight copy
    * from a publisher that died mid-copy (a claim older than the
    * grace window whose completeness rider never landed is wedged
    * garbage, not a live race). Only meaningful while [[isPending]];
    * defaults to the advisory object age. */
  def pendingSinceMs(path: String): Long = modifiedMs(path)

  /** Advisory object age for vacuum's grace window ONLY — never a
    * protocol timeline (commit times live inside markers). */
  def modifiedMs(path: String): Long

  def nowMs(): Long = System.currentTimeMillis()

  /** Stable identity of a path for cross-root registration equality
    * (clone registry). Local resolves symlinks; stores are identity. */
  def canonicalPath(path: String): String = path
}

/** The local-POSIX implementation — the behavior the chain always
  * had, extracted verbatim behind the seam: rename-publish,
  * createNewFile CAS, java.io listing. */
final class LocalChainStorage extends ChainStorage {
  private def f(p: String) = new java.io.File(p)

  override def list(dir: String): Seq[String] = {
    val d = f(dir)
    if (!d.isDirectory) Seq.empty
    // `.pia_*` are putIfAbsent's same-directory link temps — protocol
    // plumbing (the local analogue of the object store's riders),
    // never content a lister should see
    else d.list().toSeq.filterNot(_.startsWith(".pia_"))
  }

  override def isDir(path: String): Boolean = f(path).isDirectory
  override def isFile(path: String): Boolean = f(path).isFile

  override def read(path: String): String =
    java.nio.file.Files.readString(f(path).toPath)

  override def write(path: String, content: String): Unit = {
    val file = f(path)
    Option(file.getParentFile).foreach(_.mkdirs())
    java.nio.file.Files.writeString(file.toPath, content)
  }

  /** Atomic CAS-with-content: the content is written to a hidden
    * same-directory temp and the canonical name is taken by a hard
    * LINK — creation is atomic and fails with FileAlreadyExists when
    * the name is occupied, so a concurrent reader can never observe
    * the object existing with partial/empty content (the
    * createNewFile-then-write shape had that window: taggedVersion
    * would NumberFormatException on "", and a crash between the two
    * calls left a permanently empty-but-claimed name). Filesystems
    * without hard links fall back to the old two-step shape. */
  override def putIfAbsent(path: String, content: String): Boolean = {
    val file = f(path)
    Option(file.getParentFile).foreach(_.mkdirs())
    val tmp = new java.io.File(file.getParentFile,
      s".pia_${java.util.UUID.randomUUID().toString.take(12)}")
    try {
      java.nio.file.Files.writeString(tmp.toPath, content)
      try {
        java.nio.file.Files.createLink(file.toPath, tmp.toPath)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          // no-hardlink filesystem: degrade to create-then-write
          if (!file.createNewFile()) false
          else {
            if (content.nonEmpty)
              java.nio.file.Files.writeString(file.toPath, content)
            true
          }
      }
    } finally tmp.delete()
  }

  override def mkdirsExclusive(path: String): Boolean = f(path).mkdirs()
  override def mkdirs(path: String): Unit = f(path).mkdirs()

  override def deleteFile(path: String): Boolean = f(path).delete()

  override def deleteTree(path: String): Boolean = {
    def rm(p: java.io.File): Boolean =
      if (!p.exists()) false
      else {
        if (p.isDirectory) p.listFiles().foreach(rm)
        p.delete()
      }
    rm(f(path))
  }

  override def copyFile(src: String, dst: String): Unit = {
    Option(f(dst).getParentFile).foreach(_.mkdirs())
    java.nio.file.Files.copy(f(src).toPath, f(dst).toPath)
  }

  override def publishDir(prepared: String, canonical: String): Boolean =
    f(prepared).renameTo(f(canonical))

  /** Rename is all-or-nothing: a visible dir IS a published dir. */
  override def isPublished(path: String): Boolean = f(path).isDirectory

  /** Rename admits no observable in-flight state. */
  override def isPending(path: String): Boolean = false

  override def modifiedMs(path: String): Long = f(path).lastModified()

  override def canonicalPath(path: String): String =
    f(path).getCanonicalPath
}

object ChainStorage {

  /** The default (and production-local) storage. */
  val local: ChainStorage = new LocalChainStorage

  /** Fallback for scheme-qualified paths with no explicit
    * registration: the Hadoop FileSystem binding. Spark qualifies
    * SQL `LOCATION` clauses to URIs (`file:/x`, `hdfs://nn/x`,
    * `s3a://bucket/x`) before they reach the catalog, and the local
    * impl would treat `file:/x` as a RELATIVE java.io path — silently
    * splitting one chain's metadata across two roots. */
  private lazy val hadoopFs: ChainStorage = new HadoopFsChainStorage()

  /** `scheme:/...` — at least two scheme chars, so POSIX paths and
    * (hypothetical) drive letters never match. */
  private val schemePath = "^[A-Za-z][A-Za-z0-9+.-]+:/.*$".r

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ChainStorage]()

  /** Mount `storage` for every path under `prefix` (longest prefix
    * wins). Used by the contract spec to put fake object-store
    * semantics under a scheme-like prefix; a real deployment would
    * mount its S3/GCS binding the same way. */
  def register(prefix: String, storage: ChainStorage): Unit =
    registry.put(prefix, storage)

  def unregister(prefix: String): Unit = registry.remove(prefix)

  /** Resolve the storage owning `path`: the longest registered
    * prefix, default local. Prefixes match only at a path-segment
    * boundary — a storage registered for `/data/a` owns `/data/a`
    * and `/data/a/...`, never `/data/abc` (bare startsWith would
    * silently route an unrelated chain's metadata to the wrong
    * storage). */
  def forPath(path: String): ChainStorage = {
    var best: String = null
    val it = registry.keys()
    while (it.hasMoreElements) {
      val p = it.nextElement()
      val owns = path == p ||
        path.startsWith(p.stripSuffix("/") + "/")
      if (owns && (best == null || p.length > best.length))
        best = p
    }
    if (best != null) registry.get(best)
    else if (schemePath.matches(path)) hadoopFs
    else local
  }
}
