package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** [[HadoopFsChainStorage]] — the seam bound to a REAL
  * `org.apache.hadoop.fs.FileSystem` — proven two ways:
  *
  *   1. the raw protocol assertions of ChainStorageContractSpec
  *      (CAS publish, loser classification, crash adoption, in-marker
  *      timeline) hold through the Hadoop binding;
  *   2. a FULL chain lifecycle — buildLayout, CoW merge, DV delete,
  *      compaction, tags, time travel, restore, vacuum, and the
  *      change-feed source — runs with the table root MOUNTED through
  *      the binding, i.e. every protocol byte travels the Hadoop
  *      FileSystem API while Spark keeps the data plane. This is what
  *      turns "portable by contract" into "portable, demonstrated":
  *      an HDFS/S3A deployment registers this class for its scheme
  *      and inherits the whole lakehouse layer.
  *
  * The `file:` scheme resolves to RawLocalFileSystem inside the
  * binding (no `.crc` shadow objects — the listings-parse-names
  * assertion below pins that), without touching the global FileSystem
  * cache Spark's own `file:` users share. */
class HadoopFsChainStorageSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  /** Fresh root MOUNTED through the Hadoop binding: every
    * ChainStorage.forPath under it resolves to HadoopFsChainStorage. */
  private def mountedRoot(tag: String): (String, HadoopFsChainStorage) = {
    val root = Tables.matDir(s"hfs_${tag}_${System.nanoTime}",
      spark, sf0001)
    val st = new HadoopFsChainStorage(
      spark.sparkContext.hadoopConfiguration)
    ChainStorage.register(root, st)
    (root, st)
  }

  test("primitive semantics: create-exclusive CAS with full content, " +
    "exclusive mkdirs, list without checksum shadows") {
    val (root, st) = mountedRoot("prim")
    try {
      assert(st.putIfAbsent(s"$root/_tags/t1", "7\n"))
      assert(!st.putIfAbsent(s"$root/_tags/t1", "8\n"),
        "occupied name must lose the CAS")
      assert(st.read(s"$root/_tags/t1") === "7\n",
        "the CAS loser must never clobber content")
      assert(st.isFile(s"$root/_tags/t1") && !st.isDir(s"$root/_tags/t1"))
      assert(st.list(s"$root/_tags") === Seq("t1"),
        "metadata listings must not contain .crc shadow objects")
      assert(st.mkdirsExclusive(s"$root/b1"))
      assert(!st.mkdirsExclusive(s"$root/b1"),
        "mkdirsExclusive must be java.io-style exclusive")
      st.write(s"$root/b1/x", "payload")
      assert(st.read(s"$root/b1/x") === "payload")
      st.copyFile(s"$root/b1/x", s"$root/b1/y")
      assert(st.read(s"$root/b1/y") === "payload")
      assert(st.deleteFile(s"$root/b1/y"))
      assert(st.deleteTree(s"$root/b1"))
      assert(!st.deleteTree(s"$root/b1"), "gone means false")
    } finally ChainStorage.unregister(root)
  }

  test("publish is a CAS through the Hadoop FileSystem: one winner, " +
    "losers retryable, publish-then-crash winners adopted") {
    val (root, st) = mountedRoot("cas")
    try {
      st.write(s"$root/manifest/part-00000.parquet", "v0-bytes")
      st.write(s"$root/_created", s"ts=${st.nowMs()}\n")
      def prepare(payload: String): String = {
        val p = s"$root/manifest_${ManifestPrune.prepareToken()}"
        st.write(s"$p/part-00000.parquet", payload)
        p
      }
      val p1 = prepare("writer-1")
      val p2 = prepare("writer-2")
      assert(ManifestPrune.publish(root, 0L, p1) === 1L)
      intercept[java.util.ConcurrentModificationException] {
        ManifestPrune.publish(root, 0L, p2)
      }
      assert(st.read(s"${ManifestPrune.manifestOf(root, 1L)}" +
        "/part-00000.parquet") === "writer-1")
      // rename admits no pending state
      assert(!st.isPending(ManifestPrune.manifestOf(root, 1L)))
      // publish-then-crash winner: complete dir, no marker → adopted
      val pWin = prepare("crashed-winner")
      assert(st.publishDir(pWin, ManifestPrune.manifestOf(root, 2L)))
      assert(!st.isFile(ManifestPrune.markerPath(root, 2L)))
      intercept[java.util.ConcurrentModificationException] {
        ManifestPrune.publish(root, 1L, prepare("late"))
      }
      assert(st.isFile(ManifestPrune.markerPath(root, 2L)),
        "adoption must create the crashed winner's marker")
      assert(ManifestPrune.currentVersion(spark, root) === 2L)
      // the in-marker timeline is monotonic through the binding
      val ts = (1L to 2L).map(v =>
        ManifestPrune.commitTimeMs(root, v).get)
      assert(ts(1) > ts(0))
      // marker listing parses clean (digit names only — no shadows)
      assert(st.list(s"$root/_commits").forall(_.forall(_.isDigit)))
    } finally ChainStorage.unregister(root)
  }

  test("FULL chain lifecycle with the root mounted through the " +
    "binding: merge, DV delete, compaction, tag, time travel, " +
    "restore, vacuum") {
    val (root, st) = mountedRoot("life")
    try {
      ManifestPrune.buildLayout(docs, root, nFiles = 4)
      // v1: CoW merge (updates + inserts)
      ManifestPrune.cowMergeCommit(spark, root,
        docs.filter(col("doc_id") % 11 === 0)
          .select(col("doc_id"), lit("zz").as("new_lang")),
        docs.filter(col("doc_id") % 13 === 1)
          .select((col("doc_id") + 20000000L).as("doc_id"), col("text"),
            col("lang"), col("source"), col("n_chars")))
      // v2: DV delete
      ManifestPrune.dvDeleteCommit(spark, root,
        docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
      // v3: compaction
      ManifestPrune.compactCommit(spark, root, nFiles = 2)
      assert(ManifestPrune.currentVersion(spark, root) === 3L)

      val base = docs.count()
      val inserted = docs.filter(col("doc_id") % 13 === 1).count()
      val deleted = docs.filter(col("doc_id") % 7 === 3).count()
      val v3 = ManifestPrune.readCommitted(spark, root, 3L)
      assert(v3.count() === base + inserted - deleted)
      // only ORIGINAL ids were DV-deleted; the +20M inserts may land
      // on the same residue class and must survive
      assert(v3.filter(col("doc_id") % 7 === 3 &&
        col("doc_id") < 20000000L).count() === 0L)
      assert(v3.filter(col("lang") === "zz").count() ===
        docs.filter(col("doc_id") % 11 === 0 &&
          col("doc_id") % 7 =!= 3).count())

      // tags + SQL time travel resolve through the mounted markers
      ManifestPrune.tagVersion(root, "pre-delete", 1L)
      assert(ManifestPrune.taggedVersion(root, "pre-delete") === Some(1L))
      val t1 = ManifestPrune.commitTimeMs(root, 1L).get
      assert(ManifestPrune.versionAsOf(spark, root, t1) === 1L)
      assert(ManifestPrune.readCommitted(spark, root, 1L).count() ===
        base + inserted)

      // v4: restore v1 (pure-metadata commit through the binding)
      assert(ManifestPrune.restoreVersion(spark, root, 1L) === 4L)
      assert(ManifestPrune.readCommitted(spark, root, 4L).count() ===
        base + inserted)
      assert(ManifestPrune.commitNote(root, 4L) === Some("restore:1"))

      // vacuum: keep the last 2 + the tagged anchor; kept versions
      // read identically afterwards
      val head = ManifestPrune.readCommitted(spark, root, 4L)
        .orderBy("doc_id").collect().map(_.toSeq)
      val stats = ManifestPrune.expireVersions(spark, root,
        keepLast = 2, graceMs = 0)
      assert(stats.keptVersions.contains(4L))
      assert(stats.keptVersions.contains(1L),
        "the tagged version is a retention anchor")
      assert(ManifestPrune.readCommitted(spark, root, 4L)
        .orderBy("doc_id").collect().map(_.toSeq) === head)
      assert(ManifestPrune.currentVersion(spark, root) === 4L)
    } finally ChainStorage.unregister(root)
  }

  test("the change-feed source spills and reads through the mounted " +
    "binding (protocol on the seam, parquet on the data plane)") {
    val (root, st) = mountedRoot("feed")
    try {
      ManifestPrune.buildLayout(docs, root, nFiles = 4)
      ManifestPrune.cowMergeCommit(spark, root,
        docs.filter(col("doc_id") % 11 === 0)
          .select(col("doc_id"), lit("zz").as("new_lang")),
        docs.limit(0).select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars")))
      ManifestPrune.dvDeleteCommit(spark, root,
        docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
      val viaSource = spark.read.format("graft-table").load(root)
      val direct = ManifestPrune.changeFeed(spark, root, 0L, 2L)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("version", "op", "doc_id").collect().map(_.toSeq)
      assert(canon(viaSource) === canon(direct))
      // the spill was published through the seam: ready rider present,
      // listed via the storage, shared on re-read (no recompute dirs)
      assert(st.isFile(s"$root/_cdc/doc_id/v1/_FEED_READY"))
      assert(GraftTableSourceV2.partFiles(st,
        s"$root/_cdc/doc_id/v1").nonEmpty)
      val tmpsBefore = st.list(s"$root/_cdc/doc_id")
        .count(_.startsWith(".tmp_"))
      assert(canon(spark.read.format("graft-table").load(root)) ===
        canon(direct))
      assert(st.list(s"$root/_cdc/doc_id")
        .count(_.startsWith(".tmp_")) === tmpsBefore,
        "a re-read must adopt the published spill, not respill")
    } finally ChainStorage.unregister(root)
  }
}
