package graft.relations

import java.nio.file.Paths
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
import graft.core.{Json, Relation}
import RelationManager.BucketCol

/** Relation/DDL surface over a parquet warehouse (SURVEY §2.4; reference:
  * manifest.json §macro.dbt.create_table_as / rename_relation /
  * drop_relation …) backed by a **commit-log table format**: each table
  * directory carries `_graft_log/` manifests listing exactly the data
  * files of each version (see [[CommitLog]] for the delta+checkpoint
  * format; Delta/Iceberg-shaped, built from the public papers — nothing
  * proprietary).
  *
  * Why a log instead of directory-swap (rounds 1-2):
  *  - **O(touched-files) rewrites**: MERGE / delete+insert replace only
  *    the files that contain matched keys (`commitReplace`), not the whole
  *    table — the difference between moving 1 GB and 100 TB. With per-file
  *    column stats in the manifest, even the *planning* scan that finds
  *    those files opens only stat-range-overlapping candidates.
  *  - **Snapshot isolation**: a commit is one atomic create of the next
  *    version file; readers pin the file list they resolved, writers never
  *    mutate committed files. Concurrent commits serialize through
  *    create-if-absent with optimistic retry of the file-list transform.
  *  - **Time travel**: any retained version is readable (`readVersion`),
  *    which is what `clone --state` and state diffing want.
  *  - **Object-store ready**: all manifest I/O goes through the
  *    [[FileStore]] seam, whose only atomic primitive is
  *    create-file-if-absent — a conditional PUT. Staged data files are
  *    moved once within the table prefix before the commit (a local-fs
  *    staging detail, not part of the commit protocol — SCALE.md).
  *
  * Directories whose name starts with `_` are invisible to Spark's file
  * scans, so the log, checkpoints and staging never pollute reads. Tables
  * written before the log existed (no `_graft_log`) read as plain parquet
  * dirs and are adopted as the implicit base version on their first
  * logged commit.
  */
final class RelationManager(
    val spark: SparkSession,
    val root: String,
    store0: FileStore = null) {

  /** Metadata/publish store: explicit, or derived from the ROOT's shape —
    * URI roots (s3a://, hdfs://, …) get the Hadoop-FS store, plain paths
    * the local one. */
  val store: FileStore = Option(store0).getOrElse(FileStore.forRoot(root))

  import WarehouseIO.join

  /** A relation's table prefix — a plain path or a URI, depending on the
    * warehouse root. Always a String: java.nio.Path would normalize the
    * `scheme://` away. All filesystem access on it routes through
    * [[WarehouseIO]] / [[FileStore]]. */
  def path(rel: Relation): String = join(root, rel.schema, rel.identifier)
  private def logDir(rel: Relation): String = join(path(rel), "_graft_log")
  private def log(rel: Relation): CommitLog = new CommitLog(store, logDir(rel))

  // ------------------------------------------------------------ log I/O

  def currentVersion(rel: Relation): Option[Int] = log(rel).currentVersion

  def readVersion(rel: Relation, v: Int): TableVersion = log(rel).read(v)

  /** Pre-log parquet directory adopted as the implicit version 0. */
  private def legacyState(rel: Relation): Option[TableVersion] =
    if (!WarehouseIO.isDir(path(rel))) None
    else {
      val legacy = listDataFiles(path(rel))
      if (legacy.isEmpty) None
      else Some(TableVersion(0, legacy,
        spark.read.parquet(path(rel)).schema, Nil))
    }

  /** Current table state: the logged version, or — for pre-log tables —
    * an implicit version 0 listing the directory's parquet files. */
  def currentState(rel: Relation): Option[TableVersion] =
    currentVersion(rel).map(readVersion(rel, _)).orElse(legacyState(rel))

  /** Commit the next version by transforming the current file list.
    * Optimistic: on a concurrent-commit collision the transform re-runs
    * against the new latest state, so add/remove deltas compose. */
  private def commit(
      rel: Relation,
      newPartitionBy: Option[Seq[String]],
      newSchema: Option[StructType],
      newStatsCols: Option[Seq[String]] = None,
      addedStats: Map[String, Map[String, ColStats]] = Map.empty,
      txn: Map[String, Long] = Map.empty,
      newBucketing: Option[(Seq[String], Int)] = None,
      changeFiles: Seq[String] = Nil)(
      transform: Seq[String] => Seq[String]): TableVersion = {
    val next = log(rel).commit(
      legacyState(rel), newPartitionBy, newSchema, newStatsCols, addedStats,
      txn, newBucketing, changeFiles)(transform)
    // a data commit supersedes any prior view materialization
    store.delete(viewDefFile(rel))
    register(rel)
    next
  }

  // --------------------------------------------------------- data files

  /** Write `df`'s files into an underscore-prefixed staging dir inside
    * the table prefix and compute their per-file column stats. The files
    * are NOT moved to their final names here — [[publishStaged]] does
    * that at commit time — so until a commit references them, nothing
    * outside `_`-hidden dirs exists. This is what keeps uncommitted
    * writes invisible to BOTH readers and the first-commit legacy-dir
    * adoption (a concurrent initial backfill must not adopt a sibling
    * batch's staged files as version-0 data). */
  private def stageFiles(df: DataFrame, rel: Relation, partitionBy: Seq[String],
                         statsCols: Seq[String],
                         bucketing: Option[(Seq[String], Int)] = None): Staged = {
    WarehouseIO.mkdirs(path(rel))
    val stage = join(path(rel),
      s"_graft_stage_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    WarehouseIO.mkdirs(stage)
    try {
      // bucketed layout: rows route to their bucket via murmur3-pmod on the
      // bucket columns (the SAME function GraftBucketFunction computes for
      // storage-partitioned joins) and land in `_bucket=<id>/` dirs — a
      // physical-layout dir, never a logical column (the schema below is
      // the ORIGINAL df's). Buckets nest inside real partition dirs.
      val (toWrite, writeDirs) = bucketing match {
        case Some((cols, n)) =>
          require(!df.schema.fieldNames.contains(BucketCol),
            s"column name $BucketCol is reserved for bucketed layouts")
          import org.apache.spark.sql.functions.{col, hash, lit, pmod}
          val routed = df.withColumn(BucketCol,
            pmod(hash(cols.map(col): _*), lit(n)))
          // REBALANCE on the write dirs (r19, guide §6 — the Iceberg
          // write.distribution-mode=hash pattern): a partitionBy write
          // from T input tasks lands up to T files PER bucket dir, and a
          // wide upstream (e.g. the r19 narrow-map index builds, 32
          // tasks) multiplied the file count ~8× — staging renames,
          // manifest entries, and every later per-file DML/delete pass
          // scale with it. The rebalance clusters rows by their target
          // dir; AQE coalesces a small write to ~one file per bucket and
          // splits a skewed bucket into advisory-sized files at scale,
          // so the layout stays scale-adaptive rather than
          // task-count-shaped. (Streaming micro-batch writes keep their
          // source partitioning — AQE doesn't run there anyway.)
          val clustered =
            if (routed.isStreaming) routed
            else routed.hint("rebalance",
              (partitionBy :+ BucketCol).map(col): _*)
          (clustered, partitionBy :+ BucketCol)
        case None => (df, partitionBy)
      }
      // on an object-store root the write swaps in the direct (rename-free)
      // committer — see WarehouseIO.writeOptions
      val writer = toWrite.write.mode(SaveMode.Overwrite)
        .options(WarehouseIO.writeOptions(stage))
      (if (writeDirs.nonEmpty) writer.partitionBy(writeDirs: _*) else writer)
        .parquet(stage)
      val staged = listDataFiles(stage)
      // stats while still staged: one pruned-column aggregation job over
      // the delta (basePath recovers partition values from dir names)
      val collected: Map[String, Map[String, ColStats]] =
        if (statsCols.isEmpty || staged.isEmpty) Map.empty
        else {
          val sdf = spark.read.option("basePath", stage).parquet(stage)
          Stats.collect(sdf, statsCols).map { case (uri, cs) =>
            WarehouseIO.relativeTo(stage, uri) -> cs
          }
        }
      // a staged file the stats job never saw holds ZERO rows
      // (input_file_name groups only existing rows): record exact empty
      // stats so the zero-row drop in commitReplaceParts can fire and
      // full-stats-coverage pushdowns (COUNT/LIMIT) stay enabled
      val stageStats: Map[String, Map[String, ColStats]] =
        if (statsCols.isEmpty) collected
        else collected ++ staged.filterNot(collected.contains).map(f =>
          f -> statsCols.map(c => c -> ColStats(None, None, 0L, 0L)).toMap)
      val uniq = java.util.UUID.randomUUID().toString.take(8)
      def renamed(relPath: String): String = {
        val i = relPath.lastIndexOf('/')
        if (i < 0) s"$uniq-$relPath"
        else relPath.substring(0, i + 1) + uniq + "-" + relPath.substring(i + 1)
      }
      Staged(staged.map(renamed), storedSchema(df),
        stageStats.map { case (f, cs) => renamed(f) -> cs },
        stageDir = Some(stage),
        moves = staged.map(f => f -> renamed(f)))
    } catch { case e: Throwable => WarehouseIO.deleteDir(stage); throw e }
  }

  /** Move a staged write's files to their final table-relative names and
    * drop the staging dir — the point where a write's bytes first become
    * adoptable/visible; called immediately before the log commit that
    * references them. `except` skips files the commit decided to drop
    * (zero-row parts); they vanish with the staging dir. */
  private def publishStaged(rel: Relation, staged: Staged,
                            except: Set[String] = Set.empty): Unit =
    staged.stageDir.foreach { stage =>
      staged.moves.foreach { case (src, dst) =>
        if (!except.contains(dst))
          // through the storage seam: on an object store this is a
          // copy+delete, which the moveFile contract makes safe (the file
          // is invisible until the manifest commit references it)
          store.moveFile(join(stage, src), join(path(rel), dst))
      }
      WarehouseIO.deleteDir(stage)
    }

  /** Table-relative parquet files under a directory — see
    * [[WarehouseIO.listDataFiles]] for the pruning/tolerance rules. */
  private def listDataFiles(dir: String): Seq[String] =
    WarehouseIO.listDataFiles(dir)

  private def nullableize(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = nullableize(f.dataType), nullable = true)))
    case a: ArrayType => a.copy(elementType = nullableize(a.elementType))
    case m: MapType   => m.copy(valueType = nullableize(m.valueType))
    case other        => other
  }
  /** Parquet reads are always nullable; storing non-null fields in the log
    * schema would make the reader reject its own files. */
  private def storedSchema(df: DataFrame): StructType =
    nullableize(df.schema).asInstanceOf[StructType]

  // --------------------------------------------------- persistent views

  private def viewDefFile(rel: Relation): String = join(path(rel), "_graft_view.json")

  /** Persist a view's compiled SELECT plus its dependency relations as a
    * sidecar, so a FRESH session can lazily re-register the whole view
    * chain (VERDICT r1/r2 #1: session temp views made a downstream-only
    * selection fail across process boundaries). Replaces any prior table
    * materialization of the same relation (the materialization switched). */
  def writeViewDef(rel: Relation, sql: String, deps: Seq[Relation]): Unit = {
    WarehouseIO.deleteDir(logDir(rel))
    val d = deps.map(r =>
      s"""{"database":${Json.quote(r.database)},"schema":${Json.quote(r.schema)},""" +
        s""""identifier":${Json.quote(r.identifier)}}""")
    store.write(viewDefFile(rel),
      s"""{"sql":${Json.quote(sql)},"deps":[${d.mkString(",")}]}""")
  }

  def readViewDef(rel: Relation): Option[(String, Seq[Relation])] =
    if (!store.exists(viewDefFile(rel))) None
    else {
      val doc = Json.obj(Json.parse(store.read(viewDefFile(rel))))
      Some((Json.str(doc("sql")),
        Json.arr(doc("deps")).map(Json.obj).map(m => Relation(
          Json.str(m("database")), Json.str(m("schema")),
          Json.str(m("identifier")), "view")).toSeq))
    }

  // ---------------------------------------------- materialized-view state

  private def mvStateFile(rel: Relation): String = join(path(rel), "_graft_mv.json")

  /** Persist a materialized view's refresh fingerprint (compiled-SQL hash +
    * input relation versions / source file fingerprints) beside the data.
    * A later build whose fingerprint matches skips the recompute — the
    * engine-side equivalent of the reference's "MV exists and configuration
    * unchanged → no-op" path (manifest.json
    * §materialization_materialized_view_default). */
  def writeMvState(rel: Relation, fingerprint: String): Unit =
    store.write(mvStateFile(rel), fingerprint)

  def readMvState(rel: Relation): Option[String] = {
    val p = mvStateFile(rel)
    if (store.exists(p)) Some(store.read(p)) else None
  }

  // ------------------------------------------------------------- reads

  /** The V2 catalog name this warehouse is reachable under
    * (`SELECT … FROM <catalogName>.<schema>.<table>`): registered lazily
    * in the session conf, keyed by the warehouse root so independent
    * managers never collide. Registering also enables storage-partitioned
    * joins, so two co-bucketed commit-log tables join shuffle-free
    * through their reported KeyGroupedPartitioning (BucketingSpec). */
  lazy val catalogName: String = {
    val abs = if (WarehouseIO.isUri(root)) root
              else Paths.get(root).toAbsolutePath.toString
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val name = s"graft_$digest"
    spark.conf.set(s"spark.sql.catalog.$name",
      "org.apache.spark.sql.graft.source.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", abs)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    // one-side shuffle into the bucket layout (r15): a COMPUTED frame —
    // an ingest batch past the broadcast threshold — joining a bucketed
    // store shuffles ONLY itself (Exchange keygroupedpartitioning over
    // GraftBoundBucket); the store side streams from its BatchScan with
    // no exchange. This is the beyond-broadcast regime of every
    // *Incremental op: O(batch) shuffle against an arbitrarily large
    // bucketed index (BucketingSpec pins the plan).
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    name
  }

  def exists(rel: Relation): Boolean =
    store.exists(viewDefFile(rel)) || currentState(rel).isDefined

  def read(rel: Relation): DataFrame =
    currentState(rel) match {
      case Some(v) if v.version > 0 && v.buckets > 0 =>
        // bucketed tables resolve through the V2 catalog: the scan reports
        // KeyGroupedPartitioning over the manifest's bucket layout, so
        // joins/aggregations on the bucket key skip their shuffle —
        // while keeping every commit-log property (time travel, file-level
        // MERGE, stats pruning). The pre-r4 either/or is gone.
        spark.table(s"$catalogName.`${rel.schema}`.`${rel.identifier}`")
      case Some(v) if v.version > 0 => readState(rel, v)
      case Some(_) => spark.read.parquet(path(rel)) // legacy dir
      case None => readViewDef(rel) match {
        case Some((sql, deps)) =>
          deps.foreach(d =>
            if (!spark.catalog.tableExists(d.viewName)) register(d))
          spark.sql(sql)
        case None =>
          throw new IllegalArgumentException(s"no such relation: ${rel.render}")
      }
    }

  /** Time travel: read a specific retained version. */
  def readAt(rel: Relation, version: Int): DataFrame =
    readState(rel, readVersion(rel, version))

  /** A CONSISTENT CROSS-STORE CUT (r18 — VERDICT r17 #5): capture every
    * relation's current version such that all captured versions provably
    * COEXISTED at one instant. Each commit-log table is individually
    * snapshot-isolated, but a multi-store reader that resolves each
    * table at its own time can interleave with a concurrent writer and
    * compose MIXED store generations. Double-capture validation: read
    * all versions, read them all again; if any advanced, a commit
    * interleaved — retry. When both passes agree, every table was stable
    * across its own [first, second] capture interval, and those
    * intervals all contain the instant between the passes — a true
    * simultaneous cut, with no global lock and O(manifest-head) metadata
    * reads. NOTE: a cut is point-in-time consistent, not transaction-
    * isolated — it can land INSIDE a multi-statement operation (e.g.
    * between a GC's compensating append and its deletes); callers with a
    * cross-store invariant validate it ON the cut and retry
    * ([[graft.ops.Retrieval.pinnedBm25Stores]]). */
  def snapshotVersions(rels: Seq[Relation],
                       maxAttempts: Int = 5): Map[Relation, Int] = {
    def capture(): Map[Relation, Int] =
      rels.map(r => r -> currentState(r).map(_.version).getOrElse(
        throw new IllegalArgumentException(
          s"snapshotVersions: ${r.render} is not a commit-log table"))).toMap
    var attempt = 0
    while (attempt < maxAttempts) {
      val first = capture()
      val second = capture()
      if (first == second) return first
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"no stable cross-store cut after $maxAttempts attempts — sustained " +
        s"concurrent commits on ${rels.map(_.render).mkString(", ")}")
  }

  /** Read a relation pinned at a version from a [[snapshotVersions]]
    * cut, keeping the CURRENT-read plan properties: bucketed and
    * delete-carrying versions route through the V2 connector
    * (`versionAsOf`), so storage-partitioned joins and merge-on-read
    * anti-merge survive the pin; plain versions read their file lists
    * directly. */
  def readPinned(rel: Relation, version: Int): DataFrame = {
    val v = readVersion(rel, version)
    if (v.buckets > 0 || v.deletes.nonEmpty)
      spark.read.format("graft").option("versionAsOf", version.toString)
        .load(path(rel))
    else readState(rel, v)
  }

  private def readState(rel: Relation, v: TableVersion): DataFrame =
    if (v.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], v.schema)
    else readFiles(rel, v, v.files)

  /** Read a subset of a version's files — the pruned-scan primitive for
    * file-level MERGE. basePath recovers partition columns from dir names;
    * the explicit schema skips footer-merging inference.
    *
    * Merge-on-read: when any requested file carries positional deletes,
    * the read routes through the V2 connector (whose reader anti-merges
    * dead positions per file), narrowed to the requested subset via a
    * `_file IN (…)` predicate — manifest skipping keeps it O(subset). A
    * raw parquet read of such files would resurrect deleted rows. */
  def readFiles(rel: Relation, v: TableVersion, files: Seq[String]): DataFrame = {
    if (files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], v.schema)
    if (files.exists(v.deletes.contains)) {
      import org.apache.spark.sql.functions.{col, lit}
      val df = spark.read.format("graft")
        .option("versionAsOf", v.version.toString)
        .load(path(rel))
      val narrowed =
        if (files.toSet == v.files.toSet) df
        else df.where(col(RelationManager.FileCol).isin(files: _*))
      // honor the caller's schema override the way the raw route's
      // explicit .schema(v.schema) does: the connector re-resolves the
      // version's OWN schema, so a column added between versions (caller
      // passed from.copy(schema = to.schema)) must null-fill here, not
      // throw on an unresolvable name
      val have = narrowed.schema.fieldNames.toSet
      return narrowed.select(v.schema.fields.map(f =>
        if (have(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)).toSeq: _*)
    }
    val abs = files.map(f => join(path(rel), f))
    spark.read
      .option("basePath", path(rel))
      .schema(v.schema)
      .parquet(abs: _*)
      .select(v.schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
  }

  /** Set (or overwrite) free-form table properties in one metadata-only
    * commit — e.g. `row_level_mode = merge-on-read` to switch SQL DML to
    * positional-delete writes. Existing keys not mentioned are kept. */
  def setTableProperties(rel: Relation, props: Map[String, String]): Unit = {
    // The merged map is derived from a snapshot, so the commit carries
    // expectedBase and the whole read-merge re-runs on a collision — the
    // CAS retry alone would replay only the file-list transform, silently
    // dropping keys a concurrent property (or newProps-carrying) commit
    // added between our read and our commit (same pattern as alterTable).
    var attempts = 0
    while (true) {
      val cur = currentState(rel).getOrElse(throw new IllegalArgumentException(
        s"setTableProperties: no such table ${rel.render}"))
      // legacyState, not None: on a pre-log table a None base would commit
      // v1 with an EMPTY file list — adopting the directory keeps the data
      try {
        log(rel).commit(legacyState(rel), None, None, None, Map.empty,
          expectedBase = Some(if (cur.version > 0) cur.version else 0),
          newProps = Some(cur.props ++ props))(identity)
        return
      } catch {
        case _: java.util.ConcurrentModificationException if attempts < 20 =>
          attempts += 1
      }
    }
  }

  /** Change feed at file granularity: rows of files ADDED after version
    * `fromV`, up to and including `toV` — the incremental-read primitive
    * behind table-to-table pipes and commit-log tailing. Append-only
    * granularity: a file rewritten by merge/compaction reappears with all
    * its rows (consumers needing row-level deltas de-dup by key
    * downstream); appends — the streaming-sink and incremental-append
    * shape — yield exactly the new rows. Cost is O(changed files): the
    * two manifests diff in memory and only new files are scanned. */
  def readChanges(rel: Relation, fromV: Int, toV: Int): DataFrame = {
    val prev = if (fromV <= 0) Set.empty[String]
               else readVersion(rel, fromV).files.toSet
    val to = readVersion(rel, toV)
    readFiles(rel, to, to.files.filterNot(prev))
  }

  /** Row-level change feed computed on demand (Delta-CDF-shaped, without
    * stored change files): diff the rows of files REMOVED between the two
    * versions against the rows of files ADDED. Carried-over rows — the
    * bulk of any file-pruned rewrite — cancel under multiset difference,
    * leaving exactly the inserted rows (`_change_type = insert`: new keys
    * + post-update images) and the deleted rows (`delete`: removed keys +
    * pre-update images). Cost is O(changed files) scans + one exceptAll
    * shuffle of the changed rows — never a full-table diff, because
    * untouched files appear in neither list. Pure appends degenerate to
    * [[readChanges]] (nothing removed → no delete side, no cancellation
    * work on unchanged data). */
  def readRowChanges(rel: Relation, fromV: Int, toV: Int): DataFrame = {
    val from = if (fromV <= 0) TableVersion(0, Nil, new StructType(), Nil)
               else readVersion(rel, fromV)
    val to = readVersion(rel, toV)
    val removed = from.files.filterNot(to.files.toSet)
    val added = to.files.filterNot(from.files.toSet)
    // merge-on-read: a carried file whose delete attachments changed
    // mutated rows WITHOUT leaving the file list — read it at BOTH
    // versions (each side applies its own deletes) and let the diff
    // cancel the carried rows; newly-dead positions surface as deletes,
    // re-inserted updates as inserts. O(files-with-changed-deletes).
    val fromSet = from.files.toSet
    val deltaDirty = to.files.filter(f => fromSet.contains(f) &&
      to.deletes.getOrElse(f, Nil) != from.deletes.getOrElse(f, Nil))
    changeFrame(
      readFiles(rel, to, added ++ deltaDirty),
      readFiles(rel, from.copy(schema = to.schema), removed ++ deltaDirty))
  }

  /** Exact row-level images between two row multisets (the one diff
    * formula — carried rows cancel; used by BOTH the lazy reader above
    * and the write-time stored-change materialization, so the two can
    * never diverge). */
  private def changeFrame(a: DataFrame, r: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.lit
    a.exceptAll(r).withColumn(RelationManager.ChangeTypeCol, lit("insert"))
      .unionByName(r.exceptAll(a).withColumn(RelationManager.ChangeTypeCol, lit("delete")))
  }

  /** Commit history of a logged table, newest first (the DESCRIBE HISTORY
    * analog): version, commit wall-clock, live file count, and files
    * added/removed vs the prior retained version. Bounded by `limit`
    * and by what vacuum retained; the oldest retained version reports
    * its whole file list as adds when its predecessor is truncated. */
  def history(rel: Relation, limit: Int = 20): Seq[RelationManager.HistoryEntry] = {
    val lg = log(rel)
    val vs = lg.versions.sorted.takeRight(limit + 1)
    if (vs.isEmpty) return Nil
    val states = vs.map(v => v -> readVersion(rel, v).files.toSet).toMap
    vs.takeRight(limit).reverse.map { v =>
      val prev = states.get(v - 1).getOrElse(Set.empty)
      val cur = states(v)
      RelationManager.HistoryEntry(v, lg.committedAt(v), cur.size,
        (cur -- prev).size, (prev -- cur).size,
        lg.commitChanges(v).isDefined)
    }
  }

  /** The per-row source-file tag for planning scans over [[readFiles]]:
    * `input_file_name()` on the raw parquet route, but the connector's
    * `_file` metadata column on the delete-aware route (DSv2 scans leave
    * input_file_name EMPTY — a planning scan trusting it there would plan
    * garbage). Both forms normalize through [[relativize]] after collect
    * (`_file` is already table-relative; relativize no-ops on it). */
  def sourceFileCol(v: TableVersion, files: Seq[String]): org.apache.spark.sql.Column =
    if (files.exists(v.deletes.contains))
      org.apache.spark.sql.functions.col(RelationManager.FileCol)
    else org.apache.spark.sql.functions.input_file_name()

  /** Map `input_file_name()` URIs back to table-relative paths. */
  def relativize(rel: Relation, fileUri: String): String =
    WarehouseIO.relativeTo(path(rel), fileUri)

  // ------------------------------------------------------------ writes

  /** CTAS: stage new files, commit a version referencing only them. Old
    * files stay on disk for time travel until `vacuum`. `statsCols`
    * (typically the unique_key + partition columns) selects which columns
    * get per-file min/max in the manifest; it persists with the table so
    * later appends/merges keep recording the same stats. */
  def writeTable(df: DataFrame, rel: Relation, partitionBy: Seq[String] = Nil,
                 statsCols: Seq[String] = Nil,
                 txn: Map[String, Long] = Map.empty,
                 bucketBy: Seq[String] = Nil, buckets: Int = 0): Unit = {
    val bucketing = if (buckets > 0) Some((bucketBy, buckets)) else None
    val staged = stageFiles(df, rel, partitionBy, statsCols, bucketing)
    publishStaged(rel, staged)
    commit(rel, Some(partitionBy), Some(storedSchema(df)),
      Some(statsCols), staged.stats, txn,
      Some((bucketBy, buckets)))(_ => staged.files)
  }

  /** Append: stage new files, commit current ∪ new. The reader's schema
    * stays the table's (append goes through reconcileSchema upstream).
    * `txn` rides the commit atomically — the exactly-once hook for
    * streaming writers (see [[lastTxn]]). */
  def appendTable(df: DataFrame, rel: Relation,
                  txn: Map[String, Long] = Map.empty): Unit = {
    val cur = currentState(rel)
    val staged = stageFiles(df, rel, cur.map(_.partitionBy).getOrElse(Nil),
      cur.map(_.statsCols).getOrElse(Nil), bucketingOf(cur))
    publishStaged(rel, staged)
    commit(rel, None, cur.map(_.schema).orElse(Some(storedSchema(df))),
      None, staged.stats, txn)(_ ++ staged.files)
  }

  /** A table's declared bucket layout, if any — every write path restages
    * through it so rewritten/appended files keep their bucket routing. */
  private def bucketingOf(st: Option[TableVersion]): Option[(Seq[String], Int)] =
    st.filter(_.buckets > 0).map(v => (v.bucketBy, v.buckets))

  /** The last batch id a named writer committed to this table, read from
    * the current version's merged txn map. A streaming writer restarting
    * from a checkpoint replays its in-flight batch; comparing the replayed
    * batch id against this watermark makes the replay a no-op instead of a
    * duplicate append. */
  def lastTxn(rel: Relation, appId: String): Option[Long] =
    currentState(rel).flatMap(_.txn.get(appId))

  /** Dynamic partition overwrite (incremental insert_overwrite strategy):
    * only partitions present in `df` — plus any in `alsoClear` (microbatch
    * delete+insert of an empty batch) — are replaced; other partitions'
    * files are untouched. (reference: manifest.json
    * §default__get_insert_overwrite_merge_sql) */
  def overwritePartitions(df: DataFrame, rel: Relation, partitionBy: Seq[String],
                          alsoClear: Seq[String] = Nil): Unit =
    commitStagedPartitions(rel, stage(df, rel, partitionBy), partitionBy, alsoClear)

  /** Stage a frame's files without committing. Thread-safe: each call
    * writes to its own staging dir and unique file names. */
  def stage(df: DataFrame, rel: Relation, partitionBy: Seq[String]): Staged = {
    val cur = currentState(rel)
    stageFiles(df, rel, partitionBy,
      cur.map(_.statsCols).getOrElse(Nil), bucketingOf(cur))
  }

  /** Delete a staged-but-never-committed write (abort path — e.g. a
    * concurrent microbatch backfill failing midway). Staged files live
    * only inside their hidden staging dir, so this is one dir removal and
    * always safe. */
  def discardStaged(rel: Relation, staged: Staged): Unit =
    staged.stageDir match {
      case Some(sd) => WarehouseIO.deleteDir(sd)
      case None     => staged.files.foreach(f => store.delete(join(path(rel), f)))
    }

  /** Commit one staged partition-replacement: partitions covered by the
    * staged files — plus `alsoClear` — are swapped for the staged files;
    * creates the table (with the staged schema) when absent. */
  def commitStagedPartitions(rel: Relation, staged: Staged,
                             partitionBy: Seq[String],
                             alsoClear: Seq[String] = Nil): Unit = {
    // the replacement key is the LOGICAL partition: `_bucket=` layout dirs
    // don't count, or a batch covering only some buckets of a partition
    // would leave the other buckets' old files alive
    def partDir(f: String): String =
      f.split('/').dropRight(1)
        .filterNot(_.startsWith(BucketCol + "=")).mkString("/")
    val replaced = staged.files.map(partDir).toSet ++ alsoClear
    publishStaged(rel, staged)
    commit(rel, Some(partitionBy), Some(staged.schema), None, staged.stats) { cur =>
      cur.filterNot(f => replaced.contains(partDir(f))) ++ staged.files
    }
  }

  /** File-level replace: remove `removedFiles` from the table, add `df`'s
    * rows as new files — the commit primitive behind O(touched-files)
    * MERGE / delete+insert. */
  def commitReplace(df: DataFrame, rel: Relation, removedFiles: Seq[String],
                    txn: Map[String, Long] = Map.empty,
                    storeChanges: Boolean = false,
                    basedOn: Option[TableVersion] = None): Unit =
    commitReplaceParts(Seq(df), rel, removedFiles, txn, storeChanges, basedOn)

  /** Same, but each part stages as its own file set inside ONE commit.
    * Callers use parts to force a FILE boundary between row populations —
    * the SCD-2 rewrite splits current from history rows so the manifest's
    * null-count stats can prune history files on later runs (relying on a
    * range shuffle for the same boundary breaks under AQE coalescing).
    * Zero-row staged files are dropped from the commit (their stats say
    * rows=0), so an empty part costs nothing.
    *
    * `storeChanges` = the Delta-CDF trade (change_feed config): compute
    * the commit's exact row-level insert/delete images ONCE at write time
    * (the same exceptAll the lazy reader would run, over only the
    * touched files) and store them as change files referenced by the
    * commit — [[readCommitChanges]] then reads the feed diff-free, even
    * after the replaced data files are vacuumed. */
  def commitReplaceParts(parts: Seq[DataFrame], rel: Relation,
                         removedFiles: Seq[String],
                         txn: Map[String, Long] = Map.empty,
                         storeChanges: Boolean = false,
                         // the PLANNING state the caller read `removedFiles`
                         // under — the anchor for the merge-on-read conflict
                         // check below (rewrites read their rows lazily at
                         // that version; a fresh read here would miss delta
                         // commits landing between planning and this call)
                         basedOn: Option[TableVersion] = None): Unit = {
    val cur = currentState(rel).getOrElse(
      throw new IllegalArgumentException(s"no such relation: ${rel.render}"))
    val planned = basedOn.getOrElse(cur)
    val staged = parts.map(p =>
      stageFiles(p, rel, cur.partitionBy, cur.statsCols, bucketingOf(Some(cur))))
    val (emptyFiles, stats) = {
      val allStats = staged.flatMap(_.stats).toMap
      (allStats.collect {
        case (f, cs) if cs.values.headOption.exists(_.rows == 0L) => f
      }.toSet, allStats)
    }
    // zero-row parts are never published — they vanish with the stage dirs
    staged.foreach(publishStaged(rel, _, except = emptyFiles))
    val files = staged.flatMap(_.files).filterNot(emptyFiles)
    // the change_feed TABLE property is authoritative like Delta's
    // enableChangeDataFeed: it covers engine rewrites AND connector DML
    // with one switch, so a feed consumer can rely on every mixed commit
    // carrying images regardless of which writer produced it (model
    // config's change_feed still opts in per-materialization)
    val doStore = storeChanges ||
      cur.props.get("change_feed").exists(_.trim.equalsIgnoreCase("true"))
    val changeFiles =
      if (!doStore) Nil
      else writeChangeFrame(rel, cur, added = files, removed = removedFiles)
    val removed = removedFiles.toSet
    // Write-write conflict detection (same rule as the V2 DML path): this
    // rewrite READ `removedFiles` and replaces them. The transform runs
    // inside the commit CAS retry against the LATEST state, so if a
    // concurrent commit (another merge, optimize, vacuum-side compaction)
    // already replaced any of them, committing our rewrite would resurrect
    // its pre-image rows as duplicates — abort; the caller retries the
    // operation against fresh state. Published-but-uncommitted files stay
    // invisible (manifest-exact reads) and vacuum reclaims them.
    commit(rel, None, None, None, stats -- emptyFiles, txn, changeFiles = changeFiles) { c =>
      val vanished = removed -- c.toSet
      if (vanished.nonEmpty) throw new java.util.ConcurrentModificationException(
        s"${rel.render}: files read by this rewrite were replaced by a " +
          s"concurrent commit (${vanished.take(3).mkString(", ")}…) — retry")
      // merge-on-read twin of the vanished check: a concurrent DELTA
      // commit mutates rows WITHOUT replacing the file (new delete
      // attachments). This rewrite read `removed` under `cur`'s delete
      // state; committing now would resurrect the concurrently-deleted
      // positions inside the rewritten copy — abort and let the caller
      // retry against fresh state.
      log(rel).currentVersion.map(readVersion(rel, _)).foreach { lv =>
        removed.foreach { f =>
          if (lv.deletes.getOrElse(f, Nil) != planned.deletes.getOrElse(f, Nil))
            throw new java.util.ConcurrentModificationException(
              s"${rel.render}: $f gained merge-on-read deletes after this " +
                "rewrite's planning scan — retry")
        }
      }
      c.filterNot(removed.contains) ++ files
    }
  }

  /** Materialize one commit's row-level change images (published new files
    * vs replaced files; carried-over rows cancel under exceptAll exactly
    * like the lazy diff) into a `_graft_changes/<uuid>/` dir and return the
    * written files' table-relative paths. */
  private def writeChangeFrame(rel: Relation, cur: TableVersion,
                               added: Seq[String], removed: Seq[String]): Seq[String] = {
    val changes = changeFrame(readFiles(rel, cur, added), readFiles(rel, cur, removed))
    val sub = java.util.UUID.randomUUID().toString.take(8)
    val dir = join(path(rel), ChangesDir, sub)
    changes.write.options(WarehouseIO.writeOptions(dir)).parquet(dir)
    listDataFiles(dir).map(f => join(ChangesDir, sub, f))
  }

  private val ChangesDir = "_graft_changes"

  /** Per-commit change feed over (fromV, toV]: each interval's rows come
    * from its STORED change files when the commit recorded them (diff-free
    * — works even after the replaced data files were vacuumed), else from
    * the on-demand diff of that single interval. Rows carry
    * `_commit_version` so consumers see commit boundaries; net-effect
    * consumers keep using [[readRowChanges]], whose endpoint diff cancels
    * intermediate churn. */
  def readCommitChanges(rel: Relation, fromV: Int, toV: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val lg = log(rel)
    if (toV <= fromV) {
      // empty interval (a poller with no new commits) → empty frame with
      // the feed schema, never an empty-reduce crash
      val schema = currentState(rel).map(_.schema).getOrElse(new StructType())
        .add(RelationManager.ChangeTypeCol, StringType)
        .add(RelationManager.CommitVersionCol, IntegerType)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }
    // one replay for all interval schemas, not O(range) reconstructions.
    // Starts at fromV+1, NOT fromV: only the interval's own versions are
    // needed here, and fromV itself may be vacuum-truncated while every
    // stored-changes interval after it stays readable.
    val states = lg.readRange(math.max(1, fromV + 1), toV)
      .map(s => s.version -> s).toMap
    val frames = ((fromV + 1) to toV).map { v =>
      val base = lg.commitChanges(v) match {
        case Some(files) =>
          val schema = states(v).schema.add(RelationManager.ChangeTypeCol, StringType)
          spark.read.schema(schema)
            .parquet(files.map(f => join(path(rel), f)): _*)
        case None => readRowChanges(rel, v - 1, v)
      }
      base.withColumn(RelationManager.CommitVersionCol, lit(v))
    }
    // schema may evolve mid-interval (ALTER TABLE): align by name,
    // null-fill columns absent on either side
    frames.reduceLeft(_.unionByName(_, allowMissingColumns = true))
  }

  /** Record a writer watermark WITHOUT changing the file list — the
    * zero-row commit a CDC pipe makes when a source interval contained
    * file churn (compaction) but no row changes. Keeps the watermark
    * monotone so the next run diffs from the right version. */
  def recordTxn(rel: Relation, txn: Map[String, Long]): Unit =
    commit(rel, None, None, None, Map.empty, txn)(identity)

  /** Drop one partition (`col=value`) from the log — the delete half of
    * delete+insert-per-batch microbatch semantics. Data files stay for
    * time travel until vacuum. */
  def dropPartitionDir(rel: Relation, partDir: String): Unit =
    if (exists(rel))
      commit(rel, None, None)(_.filterNot(_.startsWith(partDir + "/")))

  def truncate(rel: Relation): Unit = {
    val schema = read(rel).schema
    commit(rel, None, Some(nullableize(schema).asInstanceOf[StructType]))(_ => Nil)
  }

  /** OPTIMIZE: compact and optionally cluster a logged table — the
    * commit-log analog of Delta/Iceberg OPTIMIZE [ZORDER] (public papers;
    * the reference delegates this to the warehouse's own OPTIMIZE).
    *
    *  - `clusterBy` non-empty: full-table rewrite through ONE range
    *    shuffle (`repartitionByRange` + `sortWithinPartitions`), so the
    *    manifest's per-file min/max on those columns become near-disjoint.
    *    This is what makes the stats-pruned MERGE/snapshot planning scan
    *    sharp: after clustering on the merge key, a delta-sized batch
    *    prunes to O(1) candidate files instead of O(overlapping-files).
    *  - `clusterBy` empty: bin-pack only files smaller than
    *    `smallFileBytes` into ~`targetFileBytes` files — cost is
    *    O(small files), large files are never rewritten.
    *
    * One atomic commit either way; concurrent readers keep their pinned
    * version (old files stay until vacuum), concurrent commits serialize
    * through the log's optimistic retry. */
  def optimize(rel: Relation, clusterBy: Seq[String] = Nil,
               smallFileBytes: Long = 32L * 1024 * 1024,
               targetFileBytes: Long = 128L * 1024 * 1024,
               zorder: Boolean = false): Unit = {
    val st = currentState(rel).getOrElse(return)
    if (st.files.isEmpty) return
    def sizeOf(f: String): Long = {
      val p = join(path(rel), f)
      if (store.exists(p)) store.sizeOf(p) else 0L
    }
    if (clusterBy.nonEmpty) {
      val unknown = clusterBy.filterNot(st.schema.fieldNames.contains)
      require(unknown.isEmpty, s"optimize ${rel.render}: unknown cluster columns $unknown")
      val n = math.max(1, math.ceil(
        st.files.map(sizeOf).sum.toDouble / targetFileBytes).toInt)
      val base = readFiles(rel, st, st.files)
      // Z-ORDER (zorder=true, >1 column): rewrite along the Morton curve
      // of per-column QUANTILE bins instead of the lexicographic
      // (col1, col2, …) sort — a lexicographic rewrite gives file-stat
      // locality on the leading column only, while interleaved quantile
      // bits make per-file min/max ranges tight on EVERY clustered
      // column at once (~√F candidate files per point predicate at two
      // columns instead of F). Quantile boundaries come from one
      // percentile_approx pass (skew-proof bins, unlike uniform
      // width_bucket ranges); binning + interleaving are fused
      // plan-constant expressions, and the rewrite stays the same ONE
      // range shuffle as the linear form.
      val clustered =
        if (RelationManager.zorderApplies(clusterBy, zorder)) {
          import org.apache.spark.sql.functions.col
          base.withColumn("__graft_z", zValueColumn(base, clusterBy))
            .repartitionByRange(n, col("__graft_z"))
            .sortWithinPartitions("__graft_z")
            .drop("__graft_z")
        } else base
          .repartitionByRange(n, clusterBy.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(clusterBy.map(org.apache.spark.sql.functions.col): _*)
      commitReplace(clustered, rel, st.files, basedOn = Some(st))
    } else {
      // merge-on-read: a file carrying positional deletes is ALWAYS a
      // compaction candidate regardless of size — rewriting it folds the
      // delete files away (readFiles applies them), restoring vectorized
      // reads and stats/LIMIT pushdowns
      val small = st.files.filter(f =>
        sizeOf(f) < smallFileBytes || st.deletes.contains(f))
      if (small.size < 2 && !small.exists(st.deletes.contains))
        return // nothing worth packing
      val n = math.max(1, math.ceil(
        small.map(sizeOf).sum.toDouble / targetFileBytes).toInt)
      val packCols =
        (if (st.partitionBy.nonEmpty) st.partitionBy else st.statsCols)
          .map(org.apache.spark.sql.functions.col)
      val packed0 = readFiles(rel, st, small)
      val packed =
        if (packCols.nonEmpty) packed0.repartition(n, packCols: _*)
        else packed0.repartition(n)
      commitReplace(packed, rel, small, basedOn = Some(st))
    }
  }

  /** The Morton key for [[optimize]]'s Z-order rewrite: per column, a
    * 256-quantile bin (one approx-percentile driver pass for the
    * boundaries — layout quality, not a correctness contract), then the
    * bit-interleave. Null or bound-less values bin 0 (sort first). */
  private def zValueColumn(df: DataFrame, cols: Seq[String],
                           bits: Int = 8): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    // fail loud on non-numeric columns: cast("double") on a string is
    // NULL row-by-row, which would silently bin that column 0 everywhere
    // — no clustering, no error, and a worse layout than the linear form
    val nonNumeric = cols.filter { c =>
      !df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    }
    require(nonNumeric.isEmpty,
      s"z-order needs numeric columns; got $nonNumeric " +
        "(cast dates/timestamps to epoch numbers, use linear clusterBy for strings)")
    require(bits * cols.size <= 64,
      s"z-order: ${cols.size} columns at $bits bits exceed one 64-bit key")
    val nb = 1 << bits
    val fracs = (1 until nb).map(i => i.toDouble / nb).toArray
    val aggs = cols.map(c =>
      percentile_approx(col(c).cast("double"), lit(fracs), lit(10000)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val binCols = cols.zipWithIndex.map { case (c, i) =>
      val cuts: Array[Double] =
        if (row.isNullAt(i)) Array.empty
        else row.getSeq[Double](i).toArray
      coalesce(org.apache.spark.sql.graft.VectorExpressions
        .quantileBin(col(c).cast("double"), cuts), lit(0))
    }
    org.apache.spark.sql.graft.VectorExpressions
      .zInterleave(array(binCols: _*), bits)
  }

  /** Delete data files no longer referenced by any retained version, and
    * log entries older than `keepVersions` back (the log first writes a
    * compaction checkpoint so retained versions stay reconstructible).
    * Run out-of-band (the reference's workflows run OPTIMIZE/VACUUM the
    * same way). */
  def vacuum(rel: Relation, keepVersions: Int = 1): Unit = {
    val lg = log(rel)
    val latest = lg.currentVersion.getOrElse(return)
    val keepFrom = math.max(1, latest - keepVersions + 1)
    val referenced = (keepFrom to latest)
      .map(lg.read).flatMap(_.files).toSet
    listDataFiles(path(rel)).filterNot(referenced.contains)
      .foreach(f => store.delete(join(path(rel), f)))
    // staging dirs from crashed runs (never published, so never
    // referenced) — like Delta VACUUM, run out-of-band of active writers
    store.list(path(rel))
      .filter(_.startsWith("_graft_stage_"))
      .foreach(d => WarehouseIO.deleteDir(join(path(rel), d)))
    // stored change dirs belong to their COMMIT: keep those referenced by
    // a retained delta, reclaim the rest (truncated or crashed-mid-write)
    val changesRoot = join(path(rel), "_graft_changes")
    val referencedChanges = (keepFrom to latest).flatMap(lg.commitChanges)
      .flatten.map(_.split('/')(1)).toSet
    store.list(changesRoot)
      .filterNot(referencedChanges.contains)
      .foreach(d => WarehouseIO.deleteDir(join(changesRoot, d)))
    // merge-on-read delete files: keep those any retained version maps,
    // reclaim the rest (their data file was compacted/removed)
    val deletesRoot = join(path(rel), "_graft_deletes")
    val referencedDel = (keepFrom to latest).map(lg.read)
      .flatMap(_.deletes.values.flatten)
      .map(_.split('/').last).toSet
    store.list(deletesRoot)
      .filterNot(referencedDel.contains)
      .foreach(f => store.delete(join(deletesRoot, f)))
    lg.truncateBefore(keepFrom)
  }

  // ------------------------------------------------- catalog / registry

  /** Bucketed CTAS over the commit log: rows route to `buckets` bucket
    * files per partition via murmur3-pmod on `bucketCols`, the layout is
    * recorded in the version manifest, and reads resolve through the V2
    * catalog whose scan reports KeyGroupedPartitioning — so co-bucketed
    * tables join WITHOUT a shuffle (storage-partitioned join, the
    * Iceberg move) while keeping time travel, file-level MERGE, and
    * stats-pruned planning. Replaces the round-3 session-catalog path,
    * which traded all of those away for CLUSTERED BY metadata. */
  def writeBucketedTable(df: DataFrame, rel: Relation,
                         buckets: Int, bucketCols: Seq[String]): Unit =
    writeTable(df, rel, statsCols = bucketCols,
      bucketBy = bucketCols, buckets = buckets)

  def readBucketedTable(rel: Relation): DataFrame = read(rel)

  /** Register as `<schema>__<identifier>` temp view for spark.sql models.
    * Views re-register their dependency chain first (recursively, via the
    * sidecar's dep list), so a fresh session resolving only a downstream
    * node pulls in every upstream view it needs. */
  def register(rel: Relation): Unit =
    read(rel).createOrReplaceTempView(rel.viewName)

  def registerView(rel: Relation, df: DataFrame): Unit =
    df.createOrReplaceTempView(rel.viewName)

  def drop(rel: Relation): Unit = {
    WarehouseIO.deleteDir(path(rel))
    spark.catalog.dropTempView(rel.viewName)
  }

  def rename(from: Relation, to: Relation): Unit = {
    WarehouseIO.mkdirs(join(root, to.schema))
    WarehouseIO.renameDir(path(from), path(to))
    spark.catalog.dropTempView(from.viewName)
    register(to)
  }

  def columnsIn(rel: Relation): StructType = read(rel).schema

  def listRelations(schema: String): Seq[String] =
    WarehouseIO.listDirNames(join(root, schema))

  def lastModified(rel: Relation): Option[java.time.Instant] =
    if (!exists(rel)) None
    else Some(java.time.Instant.ofEpochMilli(
      WarehouseIO.maxModified(path(rel)).getOrElse(0L)))

  /** persist_docs / grants (reference: manifest.json §persist_docs,
    * §apply_grants): plain parquet has no catalog comments or ACLs, so
    * relation-level docs and grant intents persist as a metadata sidecar —
    * the shape a catalog-backed deployment maps onto TBLPROPERTIES/GRANT. */
  def persistMeta(rel: Relation, docs: Map[String, String],
                  grants: Map[String, Seq[String]] = Map.empty): Unit = {
    def q(s: String) = Json.quote(s)
    val d = docs.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}: ${q(v)}" }
    val g = grants.toSeq.sortBy(_._1).map { case (k, vs) =>
      s"${q(k)}: [${vs.map(q).mkString(",")}]" }
    store.write(join(path(rel), "_graft_meta.json"),
      s"""{"docs":{${d.mkString(",")}},"grants":{${g.mkString(",")}}}""")
  }

  def readMeta(rel: Relation): Option[String] = {
    val p = join(path(rel), "_graft_meta.json")
    if (store.exists(p)) Some(store.read(p)) else None
  }

  /** Microbatch checkpoint: the max processed batch end, persisted beside
    * the data (underscore-prefixed files are invisible to parquet scans).
    * Survives sessions, so a fresh CLI run resumes where the last ended
    * (reference: checkpoint math microbatch.py:41-79). */
  /** Scheduled-operation crash journals (r18): tiny JSON sidecars under
    * `<root>/_graft_ops/`, durable in the SAME store as the tables whose
    * partial mutation they record — a crash-resumed build finds them
    * wherever the warehouse lives. Overwrite-allowed sidecar writes, same
    * contract as checkpoint markers (single-writer per project). */
  private def opJournalPath(name: String): String =
    join(join(root, "_graft_ops"), s"$name.json")

  def writeOpJournal(name: String, content: String): Unit = {
    WarehouseIO.mkdirs(join(root, "_graft_ops"))
    store.write(opJournalPath(name), content)
  }

  def readOpJournal(name: String): Option[String] = {
    val p = opJournalPath(name)
    if (store.exists(p)) Some(store.read(p)) else None
  }

  def deleteOpJournal(name: String): Unit = {
    val p = opJournalPath(name)
    if (store.exists(p)) store.delete(p)
  }

  def writeCheckpoint(rel: Relation, at: java.time.Instant): Unit =
    store.write(join(path(rel), "_graft_checkpoint"), at.toString)

  def readCheckpoint(rel: Relation): Option[java.time.Instant] = {
    val p = join(path(rel), "_graft_checkpoint")
    if (store.exists(p)) Some(java.time.Instant.parse(store.read(p).trim)) else None
  }

  /** Schema-evolution trio (reference: manifest.json §check_for_schema_changes /
    * §process_schema_changes / §sync_column_schemas; SURVEY §4). Returns the
    * reconciled DataFrame to write for append-shaped strategies. */
  def reconcileSchema(
      newDf: DataFrame,
      rel: Relation,
      onSchemaChange: graft.core.OnSchemaChange): DataFrame = {
    import graft.core.OnSchemaChange._
    if (!exists(rel)) return newDf
    val target = columnsIn(rel)
    val incoming = newDf.schema
    val added = incoming.fields.filterNot(f => target.fieldNames.contains(f.name))
    val removed = target.fields.filterNot(f => incoming.fieldNames.contains(f.name))
    if (added.isEmpty && removed.isEmpty) return newDf
    onSchemaChange match {
      case Ignore =>
        // keep the target's column set: drop new cols, null-fill removed ones
        selectAs(newDf, target)
      case AppendNewColumns =>
        // target gains new columns (null for history); write full union schema
        val widened = StructType(target.fields ++ added)
        rewriteTarget(rel, widened)
        selectAs(newDf, widened)
      case SyncAllColumns =>
        rewriteTarget(rel, incoming)
        newDf
      case Fail =>
        throw new IllegalStateException(
          s"on_schema_change=fail: +${added.map(_.name).mkString(",")} " +
            s"-${removed.map(_.name).mkString(",")} on ${rel.render}")
    }
  }

  private def selectAs(df: DataFrame, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    df.select(schema.fields.map { f =>
      if (df.schema.fieldNames.contains(f.name)) col(f.name).cast(f.dataType)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
  }

  private def rewriteTarget(rel: Relation, schema: StructType): Unit =
    writeTable(selectAs(read(rel), schema), rel,
      statsCols = currentState(rel).map(_.statsCols).getOrElse(Nil))

}

object RelationManager {
  /** Whether an optimize(clusterBy, zorder) call takes the Morton path —
    * the ONE definition of the applicability rule, shared with the CLI's
    * reporting so the message can never drift from the behavior. */
  def zorderApplies(clusterBy: Seq[String], zorder: Boolean): Boolean =
    zorder && clusterBy.size > 1

  /** Engine surface for a BARE table directory (the connector's
    * path-based tables): split `dir` into (root, schema, identifier) so
    * the full machinery — optimize, vacuum, readFiles — addresses
    * exactly `dir`. None when the dir is too shallow to split (e.g.
    * directly under a filesystem root). */
  def forTable(spark: SparkSession, dir: String): Option[(RelationManager, Relation)] = {
    val trimmed = dir.stripSuffix("/")
    val i = trimmed.lastIndexOf('/')
    if (i <= 0) return None
    val j = trimmed.lastIndexOf('/', i - 1)
    if (j <= 0) return None
    val root = trimmed.substring(0, j)
    val schema = trimmed.substring(j + 1, i)
    val id = trimmed.substring(i + 1)
    if (root.isEmpty || root.endsWith(":") || root.endsWith(":/") ||
        schema.isEmpty || id.isEmpty) None
    else Some((new RelationManager(spark, root), graft.core.Relation("graft", schema, id)))
  }

  /** Column names of the row-level change feed. */
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  /** The connector's `_file` metadata column (row's data file path). */
  val FileCol = "_file"

  /** One commit in a table's history listing. */
  final case class HistoryEntry(version: Int,
                                committedAt: Option[java.time.Instant],
                                files: Int, added: Int, removed: Int,
                                storedChanges: Boolean)

  /** Layout-dir name carrying a file's bucket id (`_bucket=<id>/…`).
    * Underscore-prefixed WITH `=`, so Spark's hidden-path rule treats it
    * as a partition dir (visible), while it never becomes a logical
    * column — manifest schemas exclude it and readers prune it. */
  val BucketCol = "_bucket"

  /** A file's bucket id, parsed from its `_bucket=<id>` path segment. */
  def bucketIdOf(file: String): Option[Int] =
    file.split('/').dropRight(1).collectFirst {
      case seg if seg.startsWith(BucketCol + "=") =>
        seg.stripPrefix(BucketCol + "=").toInt
    }
}
