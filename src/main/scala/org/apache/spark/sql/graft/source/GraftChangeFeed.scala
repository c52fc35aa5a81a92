package org.apache.spark.sql.graft.source

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String
import graft.relations.TableVersion

/** Change-feed reads through the connector — Delta-CDF-shaped, over
  * graft's stored change files:
  *
  * {{{
  *   spark.read.format("graft").option("readChangeFeed", "true")
  *     .option("startingVersion", 3).load(dir)           // [3, current] — inclusive,
  *                                                       // required for batch (Delta CDF)
  *   spark.readStream.format("graft")
  *     .option("readChangeFeed", "true").load(dir)        // tail NEW changes
  * }}}
  *
  * Output = table columns + `_change_type` (insert|delete) +
  * `_commit_version`. Per-commit exactness, planned purely from
  * manifests:
  *  - a commit that recorded STORED change files serves them verbatim
  *    (written at rewrite time by `change_feed = true` tables);
  *  - a pure-ADD commit (append, streaming epoch) serves its added files
  *    as inserts — exact with zero write amplification;
  *  - a pure-REMOVE commit (metadata DELETE, TRUNCATE) serves the removed
  *    files' rows as deletes (whole files died, so their rows ARE the
  *    delete images) while those files remain on disk;
  *  - a MIXED rewrite without stored changes fails the plan loudly —
  *    serving added-vs-removed files would report carried-over rows as
  *    churn. Enable `change_feed = true` on the table to fix.
  */
/** Write-time change images for CONNECTOR commits on `change_feed = true`
  * tables — the V2-DML twin of the engine's
  * `RelationManager.writeChangeFrame`, using the SAME exceptAll diff
  * formula so stored and computed feeds can never diverge. Covers both
  * copy-on-write rewrites (added vs scanned files) and merge-on-read
  * delta commits (new data files vs newly-dead positions), which is what
  * keeps `readChangeFeed` diff-free — and the feed plan from failing
  * loudly — on tables where SQL DML runs in either row-level mode. */
object GraftChangeImages {
  import org.apache.spark.sql.functions.{col, lit}
  import graft.relations.{RelationManager, WarehouseIO}

  private def spark = org.apache.spark.sql.SparkSession.active

  /** Rows of table-relative data files read as plain parquet (clean
    * files only — the callers pass files THIS commit wrote, or routes
    * removed files through the delete-aware connector read). */
  private def rowsOf(dir: String, st: TableVersion, files: Seq[String]) =
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st.schema)
    else spark.read
      .option("basePath", dir)
      .schema(st.schema)
      .parquet(files.map(f => WarehouseIO.join(dir, f)): _*)
      .select(st.schema.fieldNames.map(col).toSeq: _*)

  /** Rows of a version's files read through the connector (applies that
    * version's positional deletes), narrowed to `files`. */
  private def liveRowsOf(dir: String, st: TableVersion, files: Seq[String]) = {
    val df = spark.read.format("graft")
      .option("versionAsOf", st.version.toString).load(dir)
    val narrowed =
      if (files.toSet == st.files.toSet) df
      else df.where(col(GraftSourceTable.FileCol).isin(files: _*))
    narrowed.select(st.schema.fieldNames.map(col).toSeq: _*)
  }

  private def changeFrame(a: org.apache.spark.sql.DataFrame,
                          r: org.apache.spark.sql.DataFrame) =
    a.exceptAll(r).withColumn(RelationManager.ChangeTypeCol, lit("insert"))
      .unionByName(r.exceptAll(a)
        .withColumn(RelationManager.ChangeTypeCol, lit("delete")))

  private def persist(dir: String,
                      changes: org.apache.spark.sql.DataFrame): Seq[String] = {
    val sub = java.util.UUID.randomUUID().toString.take(8)
    val out = WarehouseIO.join(dir, "_graft_changes", sub)
    changes.write.options(WarehouseIO.writeOptions(out)).parquet(out)
    WarehouseIO.listDataFiles(out).map(f => WarehouseIO.join("_graft_changes", sub, f))
  }

  def enabled(st: TableVersion): Boolean =
    st.props.get("change_feed").exists(_.trim.equalsIgnoreCase("true"))

  /** Copy-on-write images: published new files vs the files the statement
    * scanned and is replacing (read at the base version through the
    * connector, so pre-existing positional deletes on them apply). */
  def copyOnWrite(dir: String, base: TableVersion,
                  added: Seq[String], removed: Seq[String]): Seq[String] =
    persist(dir, changeFrame(
      rowsOf(dir, base, added), liveRowsOf(dir, base, removed)))

  /** Merge-on-read delta images: the commit's new data files vs the rows
    * its delete files kill — each dead (file, pos) identity joined back
    * to its pre-image row at the base version. */
  def delta(dir: String, base: TableVersion,
            added: Seq[String], deleteFiles: Seq[String],
            touched: Seq[String]): Seq[String] = {
    val dead =
      if (deleteFiles.isEmpty || touched.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], base.schema)
      else {
        val ids = spark.read.schema(GraftSourceTable.DeleteSchema)
          .parquet(deleteFiles.map(f => WarehouseIO.join(dir, f)): _*)
        val pre = spark.read.format("graft")
          .option("versionAsOf", base.version.toString).load(dir)
          .where(col(GraftSourceTable.FileCol).isin(touched: _*))
          .select((base.schema.fieldNames.map(col) :+
            col(GraftSourceTable.FileCol) :+ col(GraftSourceTable.PosCol)).toSeq: _*)
        pre.join(ids,
            pre(GraftSourceTable.FileCol) === ids("file") &&
              pre(GraftSourceTable.PosCol) === ids("pos"), "left_semi")
          .select(base.schema.fieldNames.map(col).toSeq: _*)
      }
    persist(dir, changeFrame(rowsOf(dir, base, added), dead))
  }
}

object GraftChangeFeed {

  val ChangeTypeCol: String = graft.relations.RelationManager.ChangeTypeCol
  val CommitVersionCol: String = graft.relations.RelationManager.CommitVersionCol

  def outputSchema(tableSchema: StructType): StructType =
    StructType(tableSchema.fields ++ Seq(
      StructField(ChangeTypeCol, StringType, nullable = false),
      StructField(CommitVersionCol, IntegerType, nullable = false)))

  /** Plan one commit interval (fromV, toV] into change partitions. One
    * log replay covers the whole interval (readRange), not O(range) full
    * reconstructions; the replay starts INSIDE the interval so a
    * vacuum-truncated fromV never blocks stored-changes reads (the one
    * predecessor state a non-stored first interval needs is read
    * directly and fails only if that history is genuinely gone). */
  def planInterval(dir: String, fromV: Int, toV: Int): Array[InputPartition] = {
    val log = GraftSourceTable.log(dir)
    val store = GraftSourceTable.store(dir)
    val states = log.readRange(math.max(1, fromV + 1), toV)
      .map(s => s.version -> s).toMap
    (math.max(1, fromV + 1) to toV).flatMap { v =>
      val cur = states(v)
      def prev: Set[String] =
        if (v <= 1) Set.empty[String]
        else states.get(v - 1).map(_.files.toSet)
          .getOrElse(log.read(v - 1).files.toSet)
      def part(f: String, isChange: Boolean, tpe: String) = {
        val abs = graft.relations.WarehouseIO.join(dir, f)
        // pure-remove (and old pure-add) commits serve change images from
        // data files the table no longer references — vacuum may have
        // reclaimed them, and a raw NoSuchFileException from sizeOf
        // gives the caller nothing actionable
        if (!store.exists(abs)) throw new IllegalStateException(
          s"change feed on $dir: commit $v's " +
            s"${if (isChange) "stored change" else "data"} file $f was " +
            "vacuumed — that interval's history is gone; start from a later " +
            "version, or set change_feed = true so rewrites store change " +
            "images that survive until their delta is vacuumed")
        GraftChangePartition(GraftSourceTable.fileUri(dir, f), f,
          store.sizeOf(abs), v, isChange, tpe)
      }
      log.commitChanges(v) match {
        case Some(files) => files.map(part(_, isChange = true, tpe = ""))
        case None =>
          // only non-stored intervals need the predecessor state
          val p = prev
          val added = cur.files.filterNot(p)
          val removed = (p -- cur.files).toSeq.sorted
          // merge-on-read DML: a commit that attaches positional deletes
          // mutates rows WITHOUT changing the file list — a file-diff feed
          // would silently report "no changes" (or misreport new insert
          // files as the whole delta). Fail loudly instead.
          def prevDeletes: Map[String, Seq[String]] =
            if (v <= 1) Map.empty
            else states.get(v - 1).map(_.deletes).getOrElse(log.read(v - 1).deletes)
          if (cur.deletes != prevDeletes) throw new IllegalStateException(
            s"change feed on $dir: commit $v attached merge-on-read deletes — " +
              "file-granular feeds cannot express them; read row changes " +
              "through the engine's readRowChanges (exact on merge-on-read " +
              "tables), or use copy-on-write with change_feed = true")
          if (removed.isEmpty) added.map(part(_, isChange = false, "insert"))
          else if (added.isEmpty) removed.map(part(_, isChange = false, "delete"))
          else throw new IllegalStateException(
            s"change feed on $dir: commit $v rewrote files without stored change " +
              "images — set change_feed = true on the table (or read row changes " +
              "through the engine's readRowChanges)")
      }
    }.toArray
  }
}

/** One change-feed file: either a stored change file (carries its own
  * `_change_type` column) or a data file serving a pure add/remove commit
  * (constant change type). */
case class GraftChangePartition(path: String, relPath: String, length: Long,
                                commitVersion: Int, isChangeFile: Boolean,
                                changeType: String) extends InputPartition

/** `startingVersion` is INCLUSIVE and required for batch reads,
  * `endingVersion` inclusive, a stream without a start tails from the
  * current version — the Delta CDF contract, matched deliberately so
  * pipelines porting over don't silently drop their first commit. */
class GraftChangeFeedScan(dir: String, st: TableVersion,
                          startingVersion: Option[Int], toV: Int) extends Scan {
  override def readSchema(): StructType = GraftChangeFeed.outputSchema(st.schema)
  override def description(): String =
    s"GraftChangeFeedScan $dir [${startingVersion.getOrElse(-1)}, $toV]"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val start = startingVersion.getOrElse(throw new IllegalArgumentException(
        "readChangeFeed batch reads require an explicit startingVersion " +
          "(inclusive, Delta CDF semantics)"))
      GraftChangeFeed.planInterval(dir, start - 1, toV)
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftChangeFeedReaderFactory(dir, st)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftChangeFeedMicroBatchStream(dir, st,
      startingVersion.map(_ - 1).getOrElse(
        GraftSourceTable.log(dir).currentVersion.getOrElse(0)))
}

/** Offsets are commit versions, exactly like the plain table stream; each
  * microbatch is one interval's change partitions. `initialVersion` is the
  * EXCLUSIVE lower bound (last-processed version), already converted from
  * the user-facing inclusive `startingVersion`. */
class GraftChangeFeedMicroBatchStream(dir: String, st: TableVersion,
                                      initialVersion: Int)
    extends MicroBatchStream {
  private def log = GraftSourceTable.log(dir)
  override def initialOffset(): Offset = GraftVersionOffset(initialVersion)
  override def latestOffset(): Offset =
    GraftVersionOffset(log.currentVersion.getOrElse(0))
  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toInt)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].version
    val e = end.asInstanceOf[GraftVersionOffset].version
    if (e <= s) Array.empty else GraftChangeFeed.planInterval(dir, s, e)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftChangeFeedReaderFactory(dir, st)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Decodes both partition flavors and appends the constant columns:
  * stored change files are FLAT (partition values are regular columns,
  * `_change_type` in the bytes) and get `_commit_version` appended; data
  * files decode with dir-encoded partition values and get both
  * `_change_type` and `_commit_version` appended. Row-based (the feed is
  * change-sized, not table-sized). */
class GraftChangeFeedReaderFactory(dir: String, st: TableVersion)
    extends PartitionReaderFactory {

  private val tableSchema = st.schema
  private val partitionBy = st.partitionBy
  private val dataFileSchema =
    StructType(tableSchema.fields.filterNot(f => partitionBy.contains(f.name)))
  private val partSchema =
    StructType(tableSchema.fields.filter(f => partitionBy.contains(f.name)))
  private val changeFileSchema =
    StructType(tableSchema.fields :+
      StructField(GraftChangeFeed.ChangeTypeCol, StringType))

  // stored change files: flat columns incl. _change_type; append version
  private lazy val changeReader =
    GraftSourceTable.readFunction(changeFileSchema, new StructType(),
      changeFileSchema)
  // data files: partition dirs recover partition columns; append type+version
  private lazy val dataReader =
    GraftSourceTable.readFunction(dataFileSchema, partSchema, dataFileSchema)

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftChangePartition]
    val joined = new JoinedRow
    val rows: Iterator[InternalRow] =
      if (p.isChangeFile) {
        val suffix = new GenericInternalRow(Array[Any](p.commitVersion))
        val pf = PartitionedFile(InternalRow.empty,
          SparkPath.fromUrlString(p.path), 0L, p.length)
        unwrap(changeReader(pf)).map(r => joined(r, suffix))
      } else {
        val suffix = new GenericInternalRow(Array[Any](
          UTF8String.fromString(p.changeType), p.commitVersion))
        val pv = GraftSourceTable.partitionValues(p.relPath, partSchema)
        val pf = PartitionedFile(pv, SparkPath.fromUrlString(p.path), 0L, p.length)
        // the decoder yields [non-partition cols ++ partition cols]; the
        // declared output is TABLE order — reorder before the suffix
        val produced = StructType(dataFileSchema.fields ++ partSchema.fields)
        val reorder = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
          tableSchema.fields.map { f =>
            val i = produced.fieldIndex(f.name)
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              i, produced.fields(i).dataType, nullable = true)
          }.toSeq)
        unwrap(dataReader(pf)).map(r => joined(reorder(r), suffix))
      }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }

  private def unwrap(it: Iterator[InternalRow]): Iterator[InternalRow] =
    it.flatMap {
      case b: ColumnarBatch =>
        import scala.jdk.CollectionConverters._
        b.rowIterator().asScala
      case r => Iterator.single(r)
    }
}
