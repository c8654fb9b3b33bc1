package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** [[ChainStorage]] bound to a REAL `org.apache.hadoop.fs.FileSystem`
  * — the deployment seam that takes the version chain's metadata
  * protocol off local POSIX and onto whatever a cluster mounts
  * (HDFS, S3A, GCS, ABFS, local-through-Hadoop): the same FileSystem
  * layer Spark itself reads/writes the chain's parquet through, so
  * mounting this storage for a root makes the WHOLE table — data
  * plane and protocol plane — live on one filesystem.
  *
  * Contract mapping (the two primitives everything reduces to):
  *
  *   - [[putIfAbsent]] = `FileSystem.create(path, overwrite=false)`.
  *     The CAS is exactly as strong as the FS's create-exclusive:
  *     atomic on HDFS (namenode-arbitrated), atomic on S3 with
  *     conditional-PUT create (Hadoop 3.4.1+ S3A), check-then-create
  *     on raw local (the same window `File.createNewFile` always
  *     had). Content rides the same create call — no
  *     exists-with-empty-content window for readers.
  *   - [[publishDir]] = `FileSystem.rename` onto a nonexistent
  *     canonical name — atomic on HDFS and POSIX (the rename-publish
  *     shape [[LocalChainStorage]] proves); an S3-backed deployment
  *     would instead implement claim+copy+rider semantics
  *     ([[InMemoryObjectStorage]] is that contract's executable
  *     model). Rename admits no observable pending state, so
  *     [[isPending]] is constantly false here.
  *
  * The `file:` scheme is forced to `RawLocalFileSystem`: the default
  * checksummed LocalFileSystem would shadow every metadata object
  * with a `.crc` sibling, polluting [[list]] (marker/tag/spec
  * listings parse names). FS instances are resolved per scheme and
  * cached privately (never through the global FileSystem cache, whose
  * key ignores the Configuration — poisoning it with the raw-local
  * override would hand Spark's own `file:` users the wrong impl). */
final class HadoopFsChainStorage(base: Configuration)
    extends ChainStorage {

  def this() = this(new Configuration())

  private val conf = {
    val c = new Configuration(base)
    c.set("fs.file.impl",
      classOf[org.apache.hadoop.fs.RawLocalFileSystem].getName)
    c
  }

  private val fsCache =
    new java.util.concurrent.ConcurrentHashMap[String, FileSystem]()

  private def p(s: String): Path = new Path(s)

  private def fs(path: Path): FileSystem = {
    val uri = path.toUri
    val k = s"${uri.getScheme}://${Option(uri.getAuthority).getOrElse("")}"
    fsCache.computeIfAbsent(k, _ => FileSystem.newInstance(uri, conf))
  }

  override def list(dir: String): Seq[String] = {
    val d = p(dir)
    val f = fs(d)
    // `.pia_*` are LocalChainStorage.putIfAbsent's link temps — a
    // local chain may be reached through BOTH impls (bare path vs
    // file: URI), so the listing filter must agree
    try f.listStatus(d).toSeq.map(_.getPath.getName)
      .filterNot(_.startsWith(".pia_"))
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  override def isDir(path: String): Boolean = {
    val d = p(path)
    try fs(d).getFileStatus(d).isDirectory
    catch { case _: java.io.FileNotFoundException => false }
  }

  override def isFile(path: String): Boolean = {
    val d = p(path)
    try fs(d).getFileStatus(d).isFile
    catch { case _: java.io.FileNotFoundException => false }
  }

  override def read(path: String): String = {
    val d = p(path)
    val in = fs(d).open(d)
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  override def write(path: String, content: String): Unit = {
    val d = p(path)
    val out = fs(d).create(d, true) // creates parents; PUT-replace
    try out.write(content.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  override def putIfAbsent(path: String, content: String): Boolean = {
    val d = p(path)
    val f = fs(d)
    val out =
      try f.create(d, false)
      catch {
        // HDFS/raw-local signal an occupied name with
        // FileAlreadyExistsException (a subclass of IOException); any
        // other IOException where the name turns out occupied is the
        // same lost CAS
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          return false
        case e: java.io.IOException =>
          if (isFile(path)) return false else throw e
      }
    try out.write(content.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    true
  }

  /** java.io.File.mkdirs semantics: false when the dir already
    * exists (Hadoop's own mkdirs is ensure-exists, not exclusive). */
  override def mkdirsExclusive(path: String): Boolean = {
    val d = p(path)
    val f = fs(d)
    !f.exists(d) && f.mkdirs(d)
  }

  override def mkdirs(path: String): Unit = {
    val d = p(path)
    fs(d).mkdirs(d)
    ()
  }

  override def deleteFile(path: String): Boolean = {
    val d = p(path)
    fs(d).delete(d, false)
  }

  override def deleteTree(path: String): Boolean = {
    val d = p(path)
    val f = fs(d)
    f.exists(d) && f.delete(d, true)
  }

  override def copyFile(src: String, dst: String): Unit = {
    val sp = p(src)
    val dp = p(dst)
    FileUtil.copy(fs(sp), sp, fs(dp), dp, false, conf)
    ()
  }

  /** Rename-publish: atomic where the FS's rename is (HDFS, POSIX).
    * The explicit occupied-name guard keeps FS implementations with
    * mv-into-directory rename semantics from nesting the prepared dir
    * INSIDE an existing canonical instead of failing the race. */
  override def publishDir(prepared: String,
                          canonical: String): Boolean = {
    val dst = p(canonical)
    val f = fs(dst)
    if (f.exists(dst)) false
    else f.rename(p(prepared), dst)
  }

  /** Rename is all-or-nothing: a visible dir IS a published dir. */
  override def isPublished(path: String): Boolean = isDir(path)

  /** Rename admits no observable in-flight state. */
  override def isPending(path: String): Boolean = false

  override def modifiedMs(path: String): Long = {
    val d = p(path)
    try fs(d).getFileStatus(d).getModificationTime
    catch { case _: java.io.FileNotFoundException => 0L }
  }
}
