package graft.relations

import org.apache.spark.sql.types.{DataType, StructType}
import graft.core.Json

/** One committed table version: the exact set of data files a reader sees,
  * the schema (so zero-file tables still have one), the partition spec,
  * the columns stats are kept for, and per-file column stats. Files are
  * table-relative paths (`p=v/part-...parquet`). */
final case class TableVersion(
    version: Int,
    files: Seq[String],
    schema: StructType,
    partitionBy: Seq[String],
    statsCols: Seq[String] = Nil,
    stats: Map[String, Map[String, ColStats]] = Map.empty,
    // declared bucket layout (buckets == 0 → unbucketed): every data file
    // holds exactly one bucket's rows (murmur3-pmod on bucketBy), recorded
    // in the file's `_bucket=<id>` path segment. The layout rides the
    // manifest — time travel, file-level MERGE, and stats pruning all
    // compose with it, and the V2 connector turns it into a
    // KeyGroupedPartitioning for storage-partitioned joins.
    bucketBy: Seq[String] = Nil,
    buckets: Int = 0,
    // application transaction watermarks (writer id → last committed
    // batch id), carried forward and merged on every commit. The
    // exactly-once primitive for streaming writers: the watermark rides
    // the same atomic delta-file CAS as the data files it describes, so
    // "data appended" and "batch recorded" cannot diverge (same idea as
    // the Delta paper's txn action).
    txn: Map[String, Long] = Map.empty,
    // merge-on-read positional deletes (the Iceberg positional-delete /
    // Delta deletion-vector idea, from the public papers): data file →
    // delete files under _graft_deletes/, each a parquet of
    // (file: string, pos: long) naming dead row positions. A reader of a
    // mapped data file anti-joins those positions out; a commit that
    // removes a data file drops its delete entries with it (compaction
    // folds them away). Empty for copy-on-write tables.
    deletes: Map[String, Seq[String]] = Map.empty,
    // free-form table properties (e.g. row_level_mode = merge-on-read),
    // carried forward until a commit replaces them
    props: Map[String, String] = Map.empty,
    // dead-row count per delete-carrying data file, recorded by the DML
    // commit that wrote the positions (a MoR position is deleted at most
    // once, so counts add exactly). Same lifecycle as `deletes` — dropped
    // when the data file leaves the manifest. This is what lets
    // auto-compaction evaluate its ratio trigger from the manifest alone
    // instead of re-reading every delete file per commit (VERDICT r6 #4).
    deleteRows: Map[String, Long] = Map.empty)

/** A staged-but-uncommitted write. The physical files stay inside the
  * underscore-hidden staging dir (`stageDir`) until the COMMIT publishes
  * them — before that, nothing outside `_`-prefixed dirs exists, so
  * neither readers nor a concurrent first-commit's legacy-directory
  * adoption can observe uncommitted bytes (staging eagerly into the
  * table dir let a parallel initial backfill adopt a sibling batch's
  * staged files as version-0 data — a real race caught by RunnerSpec's
  * abort test). `files` are the FINAL table-relative names the commit
  * will reference; `moves` maps stage-relative → final paths. Staging is
  * the parallelizable half of a write — concurrent microbatch stages
  * many batches at once, then commits them in order. */
final case class Staged(
    files: Seq[String],
    schema: StructType,
    stats: Map[String, Map[String, ColStats]] = Map.empty,
    stageDir: Option[String] = None,
    moves: Seq[(String, String)] = Nil)

/** A commit carrying a txn watermark lost to one already recorded: the
  * batch/epoch was committed before (possibly by a zombie of this writer).
  * Exactly-once consumers treat it as "already done" and discard. */
final class StaleTxnException(val appId: String, val batchId: Long, cur: Long)
    extends RuntimeException(
      s"txn $appId batch $batchId already committed (watermark $cur) — replay")

/** The versioned manifest log of one table (Delta/Iceberg-shaped, built
  * from the public papers — nothing proprietary), running entirely on the
  * five [[FileStore]] primitives.
  *
  * Round-4 format (VERDICT r3 #2): version files are **deltas**
  * (`v<N>.json` with add/remove lists + stats for the added files), and
  * every [[CommitLog.CheckpointInterval]]-th commit also writes a compacted
  * **checkpoint** (`v<N>.ckpt.json` with the full file list + stats).
  * Reading any version costs one checkpoint + at most Interval deltas —
  * bounded, instead of O(files) per version file at millions of files.
  *
  * Commit protocol: one atomic `createIfAbsent` of the next delta file.
  * Concurrent commits serialize through that CAS with optimistic retry of
  * the file-list transform, so add/remove deltas compose. Checkpoints are
  * pure derived data: losing one costs a longer replay, never corruption.
  */
final class CommitLog(store: FileStore, dir: String) {

  import CommitLog.CheckpointInterval

  private def deltaPath(v: Int) = f"$dir/v$v%08d.json"
  private def ckptPath(v: Int) = f"$dir/v$v%08d.ckpt.json"

  private def numbered(suffix: String): Seq[Int] =
    store.list(dir).collect {
      case s if s.startsWith("v") && s.endsWith(suffix)
        && s.length == suffix.length + 9 =>
        s.stripPrefix("v").stripSuffix(suffix).toInt
    }.sorted

  def versions: Seq[Int] = numbered(".json") // length guard excludes .ckpt.json names
  private def checkpoints: Seq[Int] = numbered(".ckpt.json")

  def currentVersion: Option[Int] = versions.maxOption

  /** Reconstruct the state at `v`: nearest checkpoint at-or-before `v`,
    * then replay the (at most Interval) deltas after it. */
  def read(v: Int): TableVersion = {
    val cp = checkpoints.filter(_ <= v).maxOption
    val base = cp.map(c => readDoc(store.read(ckptPath(c)), c))
      .getOrElse(TableVersion(0, Nil, new StructType(), Nil))
    (cp.getOrElse(0) + 1 to v).foldLeft(base) { (state, dv) =>
      applyDelta(state, store.read(deltaPath(dv)), dv)
    }
  }

  /** Commit the next version by transforming the current file list.
    * `legacyBase` adopts a pre-log parquet directory as the implicit
    * version 0 on the first logged commit (its files become adds). */
  def commit(
      legacyBase: => Option[TableVersion],
      newPartitionBy: Option[Seq[String]],
      newSchema: Option[StructType],
      newStatsCols: Option[Seq[String]],
      addedStats: Map[String, Map[String, ColStats]],
      txn: Map[String, Long] = Map.empty,
      newBucketing: Option[(Seq[String], Int)] = None,
      changeFiles: Seq[String] = Nil,
      expectedBase: Option[Int] = None,
      addedDeletes: Map[String, Seq[String]] = Map.empty,
      addedDeleteRows: Map[String, Long] = Map.empty,
      newProps: Option[Map[String, String]] = None)(
      transform: Seq[String] => Seq[String]): TableVersion = {
    var attempt = 0
    while (true) {
      val logged = currentVersion.map(read)
      val cur = logged.orElse(legacyBase)
      // A caller whose mutation was derived from a snapshot (e.g. ALTER's
      // schema edit + footer check) cannot be replayed by the file-list
      // transform alone: if the base advanced, the derivation is stale.
      // Abort so the caller recomputes against the latest state — the
      // file-vanished checks inside transforms don't see schema-only
      // concurrent commits, this does.
      expectedBase.foreach { base =>
        val curV = cur.map(_.version).getOrElse(0)
        if (curV != base) throw new java.util.ConcurrentModificationException(
          s"commit base advanced at $dir: expected v$base, found v$curV — " +
            "recompute the mutation and retry")
      }
      // Exactly-once inside the CAS: a txn watermark that does not advance
      // past the recorded one means this batch/epoch already committed —
      // a pre-commit check outside the CAS cannot catch a zombie writer
      // racing its own restart, this can (it re-runs on every retry
      // against the latest state, atomic with the file-list publish).
      txn.foreach { case (app, b) =>
        cur.flatMap(_.txn.get(app)).filter(_ >= b).foreach(existing =>
          throw new StaleTxnException(app, b, existing))
      }
      // distinct: on a FIRST commit the legacy adoption lists files the
      // caller published moments ago, and an append-shaped transform then
      // adds the same file a second time — a file list is a set
      val newFiles = transform(cur.map(_.files).getOrElse(Nil)).distinct.sorted
      val prevLogged = logged.map(_.files).getOrElse(Nil).toSet
      val add = newFiles.filterNot(prevLogged)
      val remove = (prevLogged -- newFiles).toSeq.sorted
      val schema = newSchema.orElse(cur.map(_.schema)).getOrElse(
        throw new IllegalStateException(s"no schema for table log at $dir"))
      // Merge-on-read delete attachments: a delete file names positions in
      // a SPECIFIC data file — attaching to a file a concurrent commit
      // just replaced would resurrect its dead rows on the rewritten
      // copy's read path, so (like the rewrites' vanished-file checks)
      // abort inside the CAS and let the caller retry the statement.
      val newFileSet = newFiles.toSet
      addedDeletes.keys.find(!newFileSet.contains(_)).foreach(f =>
        throw new java.util.ConcurrentModificationException(
          s"delete files target $f, which is no longer referenced at $dir — " +
            "a concurrent commit replaced it; retry the statement"))
      val keptDeletes = cur.map(_.deletes).getOrElse(Map.empty)
        .view.filterKeys(newFileSet.contains).toMap
      val keptDeleteRows = cur.map(_.deleteRows).getOrElse(Map.empty)
        .view.filterKeys(newFileSet.contains).toMap
      val (nextDeletes, nextDeleteRows) = CommitLog.foldDeleteAttachments(
        keptDeletes, keptDeleteRows, addedDeletes, addedDeleteRows)
      val next = TableVersion(
        cur.map(_.version).getOrElse(0) + 1,
        newFiles,
        schema,
        newPartitionBy.orElse(cur.map(_.partitionBy)).getOrElse(Nil),
        newStatsCols.orElse(cur.map(_.statsCols)).getOrElse(Nil),
        (logged.map(_.stats).getOrElse(Map.empty) -- remove) ++
          addedStats.view.filterKeys(add.contains).toMap,
        newBucketing.map(_._1).orElse(cur.map(_.bucketBy)).getOrElse(Nil),
        newBucketing.map(_._2).orElse(cur.map(_.buckets)).getOrElse(0),
        CommitLog.mergeTxn(cur.map(_.txn).getOrElse(Map.empty), txn),
        nextDeletes,
        newProps.orElse(cur.map(_.props)).getOrElse(Map.empty),
        nextDeleteRows)
      val body = serialize(next, add, remove,
        addedStats.view.filterKeys(add.contains).toMap, txn, changeFiles,
        addedDeletes, addedDeleteRows)
      if (store.createIfAbsent(deltaPath(next.version), body)) {
        if (next.version % CheckpointInterval == 0) writeCheckpoint(next)
        return next
      }
      attempt += 1
      if (attempt > 50) throw new IllegalStateException(
        s"commit contention at $dir: gave up after $attempt attempts")
    }
    throw new IllegalStateException("unreachable")
  }

  /** States for every version in [from, to], reconstructed with ONE replay
    * (read `from`, then fold each delta forward) instead of O(range) full
    * reconstructions — the change-feed planning shape. */
  def readRange(from: Int, to: Int): Seq[TableVersion] = {
    if (to < from) return Nil
    var state = read(from)
    val out = Seq.newBuilder[TableVersion]
    out += state
    ((from + 1) to to).foreach { v =>
      state = applyDelta(state, store.read(deltaPath(v)), v)
      out += state
    }
    out.result()
  }

  /** Drop log entries before `keepFrom`, first materializing a checkpoint
    * AT `keepFrom` so every retained version stays reconstructible. */
  def truncateBefore(keepFrom: Int): Unit = {
    if (keepFrom <= 1) return
    if (!checkpoints.contains(keepFrom)) writeCheckpoint(read(keepFrom))
    versions.filter(_ < keepFrom).foreach(v => store.delete(deltaPath(v)))
    checkpoints.filter(_ < keepFrom).foreach(v => store.delete(ckptPath(v)))
  }

  /** Checkpoints are derived data: best-effort create, losers no-op.
    * A checkpoint carries the FULL merged txn map (a delta carries only
    * that commit's new entries). */
  private def writeCheckpoint(v: TableVersion): Unit =
    store.createIfAbsent(ckptPath(v.version),
      serialize(v, v.files, Nil, v.stats, v.txn, Nil, v.deletes, v.deleteRows))

  // ----------------------------------------------------------- (de)serialization

  /** A commit's wall-clock timestamp (the `committed_at` its writer
    * recorded) — what `TIMESTAMP AS OF` resolves against. None if the
    * delta was vacuumed. */
  def committedAt(v: Int): Option[java.time.Instant] = {
    val p = deltaPath(v)
    if (!store.exists(p)) None
    else Json.obj(Json.parse(store.read(p))).get("committed_at")
      .map(s => java.time.Instant.parse(Json.str(s)))
  }

  /** Stored change files of one COMMIT (not part of table state): the
    * per-commit row-level change images a `change_feed`-enabled rewrite
    * materialized at write time. None = the commit stored none (readers
    * fall back to computing the diff) or its delta was vacuumed. */
  def commitChanges(v: Int): Option[Seq[String]] = {
    val p = deltaPath(v)
    if (!store.exists(p)) return None
    Json.obj(Json.parse(store.read(p))).get("changes")
      .map(Json.arr(_).map(Json.str).toSeq).filter(_.nonEmpty)
  }

  /** `addDeletes` is DELTA-shaped in a version file (this commit's new
    * attachments) and the FULL map in a checkpoint (whose `add` is the
    * full file list — same convention). */
  private def serialize(v: TableVersion, add: Seq[String], remove: Seq[String],
                        stats: Map[String, Map[String, ColStats]],
                        txn: Map[String, Long],
                        changeFiles: Seq[String] = Nil,
                        addDeletes: Map[String, Seq[String]] = Map.empty,
                        addDeleteRows: Map[String, Long] = Map.empty): String = {
    def sarr(xs: Seq[String]) = s"[${xs.map(Json.quote).mkString(",")}]"
    def statsObj(m: Map[String, Map[String, ColStats]]): String =
      m.toSeq.sortBy(_._1).map { case (f, cols) =>
        val c = cols.toSeq.sortBy(_._1).map { case (name, s) =>
          val mn = s.min.map(x => s""""min":${Json.quote(x)},""").getOrElse("")
          val mx = s.max.map(x => s""""max":${Json.quote(x)},""").getOrElse("")
          s"""${Json.quote(name)}:{$mn$mx"nulls":${s.nulls},"rows":${s.rows}}"""
        }.mkString(",")
        s"${Json.quote(f)}:{$c}"
      }.mkString(",")
    val txnObj = txn.toSeq.sortBy(_._1)
      .map { case (k, b) => s"${Json.quote(k)}:$b" }.mkString(",")
    val changesPart =
      if (changeFiles.isEmpty) "" else s""""changes":${sarr(changeFiles)},"""
    val deletesPart =
      if (addDeletes.isEmpty) ""
      else addDeletes.toSeq.sortBy(_._1)
        .map { case (f, ds) => s"${Json.quote(f)}:${sarr(ds)}" }
        .mkString(""""add_deletes":{""", ",", "},")
    val deleteRowsPart =
      if (addDeleteRows.isEmpty) ""
      else addDeleteRows.toSeq.sortBy(_._1)
        .map { case (f, n) => s"${Json.quote(f)}:$n" }
        .mkString(""""add_delete_rows":{""", ",", "},")
    val propsPart =
      if (v.props.isEmpty) ""
      else v.props.toSeq.sortBy(_._1)
        .map { case (k, x) => s"${Json.quote(k)}:${Json.quote(x)}" }
        .mkString(""""props":{""", ",", "},")
    s"""{"version":${v.version},"schema_json":${Json.quote(v.schema.json)},""" +
      s""""partition_by":${sarr(v.partitionBy)},""" +
      s""""bucket_by":${sarr(v.bucketBy)},"buckets":${v.buckets},""" +
      s""""stats_cols":${sarr(v.statsCols)},""" +
      s""""add":${sarr(add)},"remove":${sarr(remove)},""" +
      s""""stats":{${statsObj(stats)}},""" +
      s""""txn":{$txnObj},""" + changesPart + deletesPart + deleteRowsPart + propsPart +
      s""""committed_at":${Json.quote(java.time.Instant.now().toString)}}"""
  }

  private def parseStats(v: Any): Map[String, Map[String, ColStats]] =
    Json.obj(v).map { case (f, cols) =>
      f -> Json.obj(cols).map { case (name, s) =>
        val m = Json.obj(s)
        name -> ColStats(
          m.get("min").map(Json.str),
          m.get("max").map(Json.str),
          m("nulls").asInstanceOf[Long],
          m("rows").asInstanceOf[Long])
      }
    }

  /** `txn` is absent in pre-round-4 logs — tolerate and default empty. */
  private def parseTxn(doc: Map[String, Any]): Map[String, Long] =
    doc.get("txn").map(Json.obj(_).map { case (k, v) =>
      k -> v.asInstanceOf[Long] }).getOrElse(Map.empty)

  /** Bucket spec is absent in pre-bucketing logs — default unbucketed. */
  private def parseBucketing(doc: Map[String, Any]): (Seq[String], Int) =
    (doc.get("bucket_by").map(Json.arr(_).map(Json.str).toSeq).getOrElse(Nil),
      doc.get("buckets").map(_.asInstanceOf[Long].toInt).getOrElse(0))

  /** Delete attachments / props are absent in pre-round-5 logs. */
  private def parseDeletes(doc: Map[String, Any]): Map[String, Seq[String]] =
    doc.get("add_deletes").map(Json.obj(_).map { case (f, ds) =>
      f -> Json.arr(ds).map(Json.str).toSeq }).getOrElse(Map.empty)

  /** Dead-row counts are absent in pre-round-8 logs — auto-compaction
    * falls back to counting the delete files for entries missing here. */
  private def parseDeleteRows(doc: Map[String, Any]): Map[String, Long] =
    doc.get("add_delete_rows").map(Json.obj(_).map { case (f, n) =>
      f -> n.asInstanceOf[Long] }).getOrElse(Map.empty)

  private def parseProps(doc: Map[String, Any]): Option[Map[String, String]] =
    doc.get("props").map(Json.obj(_).map { case (k, v) => k -> Json.str(v) })

  /** A checkpoint doc is a delta doc whose `add` is the full file list
    * (and whose `add_deletes` is the full deletes map). */
  private def readDoc(body: String, v: Int): TableVersion = {
    val doc = Json.obj(Json.parse(body))
    val (bucketBy, buckets) = parseBucketing(doc)
    TableVersion(v,
      Json.arr(doc("add")).map(Json.str),
      DataType.fromJson(Json.str(doc("schema_json"))).asInstanceOf[StructType],
      Json.arr(doc("partition_by")).map(Json.str).toSeq,
      Json.arr(doc("stats_cols")).map(Json.str).toSeq,
      parseStats(doc("stats")),
      bucketBy, buckets,
      parseTxn(doc),
      parseDeletes(doc),
      parseProps(doc).getOrElse(Map.empty),
      parseDeleteRows(doc))
  }

  private def applyDelta(state: TableVersion, body: String, v: Int): TableVersion = {
    val doc = Json.obj(Json.parse(body))
    val add = Json.arr(doc("add")).map(Json.str)
    val remove = Json.arr(doc("remove")).map(Json.str).toSet
    val (bucketBy, buckets) = parseBucketing(doc)
    val files = (state.files.filterNot(remove) ++ add).distinct.sorted
    val fileSet = files.toSet
    val kept = state.deletes.view.filterKeys(fileSet.contains).toMap
    val keptRows = state.deleteRows.view.filterKeys(fileSet.contains).toMap
    val (deletes, deleteRows) = CommitLog.foldDeleteAttachments(
      kept, keptRows, parseDeletes(doc), parseDeleteRows(doc))
    TableVersion(v,
      files,
      DataType.fromJson(Json.str(doc("schema_json"))).asInstanceOf[StructType],
      Json.arr(doc("partition_by")).map(Json.str).toSeq,
      Json.arr(doc("stats_cols")).map(Json.str).toSeq,
      (state.stats -- remove) ++ parseStats(doc("stats")),
      bucketBy, buckets,
      CommitLog.mergeTxn(state.txn, parseTxn(doc)),
      deletes,
      parseProps(doc).getOrElse(state.props),
      deleteRows)
  }
}

object CommitLog {
  /** Every Nth commit compacts the log into a checkpoint; reads replay at
    * most this many deltas. 10 bounds manifest read cost without bloating
    * small tables' logs. */
  val CheckpointInterval = 10

  /** Merge txn watermarks into a manifest state. Operation-statement
    * replay guards (app ids shaped `graft-op:<node>:<fingerprint>`) are
    * pruned per node when a NEWER run's guard for the same node arrives:
    * a completed run's fingerprint is dead weight once a later run
    * commits (a crashed run resumes under its OWN journal fingerprint
    * before any new fingerprint can commit — runOperationNode fails loud
    * otherwise), so the manifest carries at most one live guard per
    * (node, table) instead of accreting one per operation run forever.
    * Used by BOTH the commit CAS and delta replay so a log replay
    * reproduces the committed state exactly. */
  private[relations] def mergeTxn(cur: Map[String, Long],
                                  incoming: Map[String, Long]): Map[String, Long] = {
    val prefixes = incoming.keys.collect {
      case a if a.startsWith("graft-op:") && a.lastIndexOf(':') > "graft-op:".length =>
        a.substring(0, a.lastIndexOf(':') + 1)
    }.toSet
    val pruned =
      if (prefixes.isEmpty) cur
      else cur.view.filterKeys(k => !prefixes.exists(k.startsWith)).toMap
    pruned ++ incoming
  }

  /** Fold newly-attached MoR delete files and their dead-row counts into
    * a manifest state. The delete-file lists are a SET (`.distinct` — a
    * replayed or overlapping commit that re-attaches the same delete file
    * must not double its positions on the read path), so the dead-row
    * arithmetic must match: a data file whose added delete files are ALL
    * already attached contributes zero new dead rows. Without this, the
    * O(manifest) live-row count (`requireFreshTermStats`) over-subtracts
    * on replay and false-fails even though the anti-merged read is
    * correct. A single DML commit writes fresh delete-file paths, so
    * partial overlap cannot occur outside a byte-identical replay. */
  private[relations] def foldDeleteAttachments(
      keptDeletes: Map[String, Seq[String]],
      keptRows: Map[String, Long],
      addedDeletes: Map[String, Seq[String]],
      addedRows: Map[String, Long])
      : (Map[String, Seq[String]], Map[String, Long]) = {
    val nextDeletes = addedDeletes.foldLeft(keptDeletes) {
      case (m, (f, ds)) => m + (f -> (m.getOrElse(f, Nil) ++ ds).distinct)
    }
    val nextRows = addedRows.foldLeft(keptRows) {
      case (m, (f, n)) =>
        val prior = keptDeletes.getOrElse(f, Nil).toSet
        val added = addedDeletes.getOrElse(f, Nil)
        if (added.nonEmpty && added.forall(prior.contains)) m
        else m + (f -> (m.getOrElse(f, 0L) + n))
    }
    (nextDeletes, nextRows)
  }
}
