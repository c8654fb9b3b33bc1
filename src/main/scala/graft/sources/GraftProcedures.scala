package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `CALL graft.system.<proc>(…)` — the chain's maintenance surface in
  * pure SQL (Iceberg's stored-procedure stance: `expire_snapshots`,
  * `rollback_to_snapshot`, … live behind the catalog, not a client
  * library), on Spark 4's public `ProcedureCatalog` face. Every
  * procedure is a thin SQL-to-[[ManifestPrune]] binding: argument
  * decode, table-name resolution through the SAME catalog lookup
  * `SELECT` uses (process map → warehouse `_catalog`), one library
  * call, and a single-row [[LocalScan]] result — O(1) driver rows,
  * never a data read. Side-effecting procedures are declared
  * non-deterministic so the planner never caches or re-invokes them.
  *
  * Surface: compact, expire_versions (dry_run-able), create_tag,
  * drop_tag, restore, create_branch, fast_forward, drop_branch,
  * evolve_clustering. */
private[sources] object GraftProcedures {

  private val All: Seq[String] = Seq(
    "compact", "expire_versions", "create_tag", "drop_tag", "restore",
    "create_branch", "fast_forward", "drop_branch", "evolve_clustering",
    "build_index", "extend_index", "clone", "detach_clone",
    "rewrite_grouped")

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      All.map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  def load(catalog: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")) &&
      All.contains(ident.name),
      s"no such procedure: ${ident.namespace.mkString(".")}.${ident.name}" +
        s" — known: system.{${All.mkString(", ")}}")
    new GraftProcedure(catalog, ident.name)
  }

  // -------------------------------------------------- param helpers

  private def p(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).build()
  private def pd(name: String, dt: DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** (parameters, result schema) per procedure. `table` is always the
    * catalog-relative name (`db.t`); version args default to -1 =
    * current head. */
  private[sources] def signature(proc: String)
      : (Array[ProcedureParameter], StructType) = proc match {
    case "compact" => (
      Array(p("table", StringType), p("target_files", IntegerType)),
      new StructType().add("version", LongType, nullable = false))
    case "expire_versions" => (
      Array(p("table", StringType), p("keep_last", IntegerType),
        pd("grace_ms", LongType, "86400000"),
        pd("older_than_ms", LongType, Long.MaxValue.toString),
        pd("dry_run", BooleanType, "false")),
      new StructType()
        .add("kept_versions", StringType, nullable = false)
        .add("removed_data_files", LongType, nullable = false)
        .add("removed_manifest_dirs", LongType, nullable = false)
        .add("removed_dv_dirs", LongType, nullable = false)
        .add("removed_staging_dirs", LongType, nullable = false)
        .add("dry_run", BooleanType, nullable = false))
    case "create_tag" => (
      Array(p("table", StringType), p("name", StringType),
        pd("version", LongType, "-1")),
      new StructType().add("version", LongType, nullable = false))
    case "drop_tag" => (
      Array(p("table", StringType), p("name", StringType)),
      new StructType().add("existed", BooleanType, nullable = false))
    case "restore" => (
      Array(p("table", StringType), p("version", LongType)),
      new StructType().add("version", LongType, nullable = false))
    case "create_branch" => (
      Array(p("table", StringType), p("name", StringType),
        pd("from_version", LongType, "-1")),
      new StructType().add("branch_root", StringType, nullable = false))
    case "fast_forward" => (
      Array(p("table", StringType), p("branch", StringType)),
      new StructType().add("version", LongType, nullable = false))
    case "drop_branch" => (
      Array(p("table", StringType), p("name", StringType),
        pd("force", BooleanType, "false")),
      new StructType().add("dropped", BooleanType, nullable = false))
    case "evolve_clustering" => (
      Array(p("table", StringType), p("stats_col", StringType),
        pd("cluster_cols", StringType, "''")),
      new StructType().add("version", LongType, nullable = false))
    case "build_index" => (
      Array(p("table", StringType), pd("key", StringType, "'doc_id'"),
        pd("bits_per_key", LongType, "10")),
      new StructType().add("version", LongType, nullable = false)
        .add("index_dir", StringType, nullable = false))
    case "extend_index" => (
      Array(p("table", StringType), pd("from_version", LongType, "-1")),
      new StructType().add("version", LongType, nullable = false)
        .add("index_dir", StringType, nullable = false))
    case "clone" => (
      Array(p("table", StringType), p("location", StringType),
        pd("as_table", StringType, "''"),
        pd("version", LongType, "-1")),
      new StructType().add("clone_root", StringType, nullable = false))
    case "detach_clone" => (
      Array(p("table", StringType), p("location", StringType)),
      new StructType().add("detached", BooleanType, nullable = false))
    case "rewrite_grouped" => (
      Array(p("table", StringType), p("column", StringType),
        pd("target_files", IntegerType, "16")),
      new StructType().add("version", LongType, nullable = false))
  }
}

private[sources] class GraftProcedure(catalog: GraftCatalog,
                                      proc: String)
    extends UnboundProcedure with BoundProcedure {

  import GraftProcedures.signature

  override def name(): String = proc
  override def description(): String =
    s"graft chain maintenance: $proc"
  override def bind(inputType: StructType): BoundProcedure = this
  // every procedure here mutates (or inspects live) chain state
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] =
    signature(proc)._1

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val s = SparkSession.active
    val rootOfArg: String => String = q => catalog.chainRootOf(q)
    import ManifestPrune._
    def str(i: Int) = input.getUTF8String(i).toString
    def headOr(root: String, v: Long): Long =
      if (v >= 0) v else currentVersion(s, root)

    val (row, schema): (InternalRow, StructType) = proc match {
      case "compact" =>
        val root = rootOfArg(str(0))
        (InternalRow(compactCommit(s, root, input.getInt(1))),
          signature(proc)._2)
      case "expire_versions" =>
        val root = rootOfArg(str(0))
        val dry = input.getBoolean(4)
        val st = expireVersions(s, root, input.getInt(1),
          graceMs = input.getLong(2), olderThanMs = input.getLong(3),
          dryRun = dry)
        (InternalRow(
          UTF8String.fromString(st.keptVersions.mkString(",")),
          st.removedDataFiles, st.removedManifestDirs,
          st.removedDvDirs, st.removedStagingDirs, dry),
          signature(proc)._2)
      case "create_tag" =>
        val root = rootOfArg(str(0))
        val v = headOr(root, input.getLong(2))
        tagVersion(root, str(1), v)
        (InternalRow(v), signature(proc)._2)
      case "drop_tag" =>
        val root = rootOfArg(str(0))
        (InternalRow(deleteTag(root, str(1))), signature(proc)._2)
      case "restore" =>
        val root = rootOfArg(str(0))
        (InternalRow(restoreVersion(s, root, input.getLong(1))),
          signature(proc)._2)
      case "create_branch" =>
        val root = rootOfArg(str(0))
        val from = headOr(root, input.getLong(2))
        (InternalRow(UTF8String.fromString(
          createBranch(s, root, str(1), from))), signature(proc)._2)
      case "fast_forward" =>
        val root = rootOfArg(str(0))
        (InternalRow(fastForward(s, root, str(1))), signature(proc)._2)
      case "drop_branch" =>
        val root = rootOfArg(str(0))
        dropBranch(s, root, str(1), force = input.getBoolean(2))
        (InternalRow(true), signature(proc)._2)
      case "evolve_clustering" =>
        val root = rootOfArg(str(0))
        val extra = str(2).split(",").map(_.trim).filter(_.nonEmpty)
        (InternalRow(evolveClustering(s, root, str(1),
          extra.toIndexedSeq)), signature(proc)._2)
      case "build_index" =>
        // per-file bloom index for the CURRENT version — the
        // point-lookup/point-delete acceleration, now a maintenance
        // CALL like Iceberg's rewrite procedures
        val root = rootOfArg(str(0))
        val v = currentVersion(s, root)
        val dir = BloomIndex.build(s, root, v, str(1),
          input.getLong(2))
        (InternalRow(v, UTF8String.fromString(dir)),
          signature(proc)._2)
      case "extend_index" =>
        // O(new files) index maintenance: carry the sketches of an
        // already-indexed version forward to the head (from_version
        // -1 = the LATEST indexed version at or below the head)
        val root = rootOfArg(str(0))
        val v = currentVersion(s, root)
        val fromArg = input.getLong(1)
        val from =
          if (fromArg >= 0) fromArg
          else {
            val st2 = ChainStorage.forPath(root)
            (0L to v).filter(x =>
              st2.isDir(BloomIndex.indexDir(root, x)))
              .lastOption.getOrElse(throw new IllegalStateException(
                s"no bloom index on any version of ${str(0)} — " +
                  "CALL graft.system.build_index first"))
          }
        val dir = BloomIndex.extend(s, root, from, v,
          BloomIndex.indexedColumn(BloomIndex.indexDir(root, from))
            .getOrElse("doc_id"))
        (InternalRow(v, UTF8String.fromString(dir)),
          signature(proc)._2)
      case "clone" =>
        // zero-copy table fork (Iceberg/Delta shallow clone) as a
        // CALL: files shared by path, the source's vacuum protects
        // every registered clone's manifests; `as_table` optionally
        // registers the clone in the catalog right away
        val root = rootOfArg(str(0))
        val dst = str(1)
        val out = cloneTable(s, root, dst, input.getLong(3))
        val as = str(2)
        if (as.nonEmpty) {
          // the clone inherits the SOURCE table's merge key — a
          // hardcoded doc_id would make SQL DML on a clone of a
          // table keyed on another column merge on the wrong key
          val key = catalog.mergeKeyOf(str(0))
          GraftCatalog.registerTable(as, out, key)
          catalog.persistRegistration(as, out, key)
        }
        (InternalRow(UTF8String.fromString(out)), signature(proc)._2)
      case "detach_clone" =>
        val root = rootOfArg(str(0))
        (InternalRow(detachClone(root, str(1))), signature(proc)._2)
      case "rewrite_grouped" =>
        val root = rootOfArg(str(0))
        (InternalRow(rewriteGroupedCommit(s, root, str(1),
          input.getInt(2))), signature(proc)._2)
    }
    java.util.List.of[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = Array(row)
      override def description(): String = s"graft-procedure $proc"
    }).iterator()
  }
}
