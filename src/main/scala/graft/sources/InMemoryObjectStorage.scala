package graft.sources

/** An OBJECT-STORE model of [[ChainStorage]] — S3/GCS semantics, not
  * POSIX: a flat key→bytes map with NO directories, NO atomic rename,
  * NO mtimes (the [[modifiedMs]] here returns a deliberately useless
  * constant so any protocol path that still leaned on mtimes fails
  * loudly in the contract spec), and list-after-put visibility. The
  * one atomic primitive is the conditional PUT ([[putIfAbsent]]),
  * which is exactly what real object stores offer (S3
  * `If-None-Match: *`, GCS `ifGenerationMatch=0`).
  *
  * [[publishDir]] is therefore claim → copy → completeness rider:
  *
  *   1. `putIfAbsent(canonical + "/.claim")` — the CAS decides the
  *      race before a byte moves; losers observe `false`.
  *   2. objects copy one at a time (a crash here leaves a PENDING
  *      canonical — visible but not truth, which is why the commit
  *      protocol gates every read on [[isPublished]] and classifies
  *      [[isPending]] as a retryable race, never adoptable state).
  *   3. `canonical/.published` lands last — the moment the dir
  *      becomes adoptable truth.
  *
  * ChainStorageContractSpec drives [[ManifestPrune]]'s commit
  * protocol (CAS publish, crash adoption, marker timeline /
  * versionAsOf, tags, notes) through this class to prove the
  * protocol holds on the trait contract alone — the port seam a real
  * S3/GCS binding would implement the same way. `failCopiesAfter`
  * injects a mid-copy crash for the pending-state tests. */
final class InMemoryObjectStorage extends ChainStorage {

  private case class Obj(content: String, createdMs: Long)

  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, Obj]()

  /** Crash injection: when >= 0, the Nth copyFile inside publishDir
    * throws — simulating a writer dying mid-copy. */
  @volatile var failCopiesAfter: Int = -1

  /** Stale-claim grace window: a `.claim` at least this old whose
    * `.published` rider never landed belongs to a publisher that died
    * mid-copy — a later publisher may take it over (delete the wedged
    * claim + partial copies, re-race the CAS) instead of livelocking
    * on a canonical name that can never advance. Must exceed the
    * longest plausible copy, like every crash-vs-slow grace window
    * (Iceberg's orphan-file older-than has the same contract); tests
    * set 0 to exercise the takeover deterministically. */
  @volatile var claimGraceMs: Long = 15L * 60 * 1000

  private def norm(p: String): String = p.stripSuffix("/")

  /** Internal rider objects are protocol plumbing, never listed. */
  private def rider(name: String): Boolean =
    name == ".claim" || name == ".published" || name == ".dir"

  private def keys: Iterator[String] = {
    import scala.jdk.CollectionConverters._
    objects.keySet().asScala.iterator
  }

  override def list(dir: String): Seq[String] = {
    val prefix = norm(dir) + "/"
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    keys.filter(_.startsWith(prefix)).foreach { k =>
      val head = k.substring(prefix.length).takeWhile(_ != '/')
      if (!rider(head)) seen += head
    }
    seen.toSeq
  }

  override def isDir(path: String): Boolean = {
    val prefix = norm(path) + "/"
    keys.exists(_.startsWith(prefix))
  }

  override def isFile(path: String): Boolean =
    objects.containsKey(norm(path))

  override def read(path: String): String = {
    val o = objects.get(norm(path))
    if (o == null)
      throw new java.io.FileNotFoundException(s"no object at $path")
    o.content
  }

  override def write(path: String, content: String): Unit =
    objects.put(norm(path), Obj(content, nowMs()))

  override def putIfAbsent(path: String, content: String): Boolean =
    objects.putIfAbsent(norm(path), Obj(content, nowMs())) == null

  /** Object stores have no directories: exclusivity via a marker
    * object under the prefix. */
  override def mkdirsExclusive(path: String): Boolean =
    !isDir(path) && putIfAbsent(norm(path) + "/.dir", "")

  override def mkdirs(path: String): Unit = ()

  override def deleteFile(path: String): Boolean =
    objects.remove(norm(path)) != null

  override def deleteTree(path: String): Boolean = {
    val p = norm(path)
    val prefix = p + "/"
    var any = objects.remove(p) != null
    val doomed = keys.filter(_.startsWith(prefix)).toSeq
    doomed.foreach { k => if (objects.remove(k) != null) any = true }
    any
  }

  override def copyFile(src: String, dst: String): Unit =
    write(dst, read(src))

  override def publishDir(prepared: String,
                          canonical: String): Boolean = {
    val can = norm(canonical)
    // 1. the CAS claim — exactly one publisher of a canonical name.
    //    A lost CAS against a STALE claim (no rider, past the grace
    //    window — its publisher died mid-copy) is taken over: the
    //    wedged claim and its partial copies are cleared and the CAS
    //    re-raced, so a crashed publisher can never wedge a version
    //    forever. A lost CAS against a live claim or a published dir
    //    stays a plain loss.
    if (!putIfAbsent(s"$can/.claim", prepared)) {
      val claim = objects.get(s"$can/.claim")
      val stale = !isFile(s"$can/.published") && claim != null &&
        nowMs() - claim.createdMs >= claimGraceMs
      if (!stale) return false
      deleteTree(can)
      if (!putIfAbsent(s"$can/.claim", prepared)) return false
    }
    // 2. non-atomic object copy (crash-injectable)
    var copied = 0
    list(prepared).foreach { n =>
      if (failCopiesAfter >= 0 && copied >= failCopiesAfter)
        throw new RuntimeException(
          s"injected crash after $copied copies into $can")
      copyFile(s"${norm(prepared)}/$n", s"$can/$n")
      copied += 1
    }
    // 3. completeness rider — the publication instant
    write(s"$can/.published", "")
    deleteTree(prepared)
    true
  }

  override def isPublished(path: String): Boolean = {
    val p = norm(path)
    // published via the protocol, or directly written (base layouts,
    // branch/clone copies) without ever being a publish target
    isFile(s"$p/.published") || (isDir(p) && !isFile(s"$p/.claim"))
  }

  override def isPending(path: String): Boolean = {
    val p = norm(path)
    isFile(s"$p/.claim") && !isFile(s"$p/.published")
  }

  /** When the pending claim was taken — the ONE age an object store
    * does expose (object creation time), and the only one the
    * stale-claim rule needs. */
  override def pendingSinceMs(path: String): Long = {
    val o = objects.get(s"${norm(path)}/.claim")
    if (o == null) Long.MaxValue else o.createdMs
  }

  /** Deliberately USELESS: object stores give no POSIX mtime, and the
    * contract spec proves the protocol timeline never needs one. (The
    * grace-window age check real vacuums use would read the object
    * creation time; returning the epoch here makes everything "old
    * enough", which is the conservative test posture.) */
  override def modifiedMs(path: String): Long = 0L
}
