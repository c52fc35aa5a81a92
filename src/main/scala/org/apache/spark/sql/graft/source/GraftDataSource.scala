package org.apache.spark.sql.graft.source

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
import graft.relations.{CommitLog, LocalFileStore, TableVersion}

/** DataSource V2 connector for graft commit-log tables:
  *
  * {{{
  *   spark.read.format("graft").load(tableDir)                      // current version
  *   spark.read.format("graft").option("versionAsOf", 3).load(dir)  // time travel
  *   spark.readStream.format("graft").load(tableDir)                // tail commits
  * }}}
  *
  * Reads are MANIFEST-exact: the file list comes from the version log, never
  * a directory listing — uncommitted/staged files are invisible, vacuumed-but
  * -referenced states fail loudly, and the streaming side's offsets are
  * commit versions, so each microbatch is precisely the files one commit
  * interval added (the same contract as `RelationManager.readChanges`).
  * Column pruning pushes into the parquet scan (SupportsPushDownRequiredColumns).
  *
  * Executor-side decoding delegates to Spark's own parquet reader
  * (`ParquetFileFormat.buildReaderWithPartitionValues` — the function
  * `FileSourceScanExec` ships to `FileScanRDD`), so the connector adds
  * manifest semantics without reimplementing any decoding. Partitioned
  * tables (partition values encoded in dir names, not file bytes) are
  * rejected until partition-value parsing lands — the engine's own readers
  * (`RelationManager.read/readAt`) cover those.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"
  override def supportsExternalMetadata(): Boolean = false

  private def tablePath(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft source requires .load(<table dir>)"))
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSourceTable.resolve(tablePath(options),
      Option(options.get("versionAsOf")).map(_.toInt)).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val dir = properties.get("path")
    val st = GraftSourceTable.resolve(dir,
      Option(properties.get("versionAsOf")).map(_.toInt))
    new GraftSourceTable(dir, schema, bucketBy = st.bucketBy, buckets = st.buckets)
  }
}

object GraftSourceTable {
  def log(dir: String): CommitLog =
    new CommitLog(new LocalFileStore, java.nio.file.Paths.get(dir, "_graft_log").toString)

  def resolve(dir: String, versionAsOf: Option[Int]): TableVersion = {
    val l = log(dir)
    val v = versionAsOf.orElse(l.currentVersion).getOrElse(
      throw new IllegalArgumentException(s"no graft commit log under $dir"))
    l.read(v)
  }

  /** The driver-built, executor-shipped parquet decode function —
    * exactly what FileSourceScanExec hands to FileScanRDD. Partition
    * columns are appended to each row from the values parsed out of the
    * file's directory name (the Hive-layout contract parquet files omit). */
  def readFunction(dataSchema: StructType, partitionSchema: StructType,
                   requiredData: StructType,
                   filters: Seq[org.apache.spark.sql.sources.Filter] = Nil,
                   returningBatch: Boolean = false):
      PartitionedFile => Iterator[InternalRow] = {
    val spark = SparkSession.active
    new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, dataSchema, partitionSchema, requiredData,
      filters,
      // batch mode feeds createColumnarReader (vectorized path); row mode
      // yields plain InternalRows for createReader
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> returningBatch.toString),
      spark.sessionState.newHadoopConf())
  }

  /** Manifest-stats file skipping (the Delta data-skipping move, at the
    * connector): drop every file whose per-column min/max (or dir-encoded
    * partition value) proves no row can satisfy `filters`. Conservative by
    * construction — files without stats, non-comparable types, and filter
    * shapes outside the supported set always survive, and Spark re-applies
    * every filter post-scan, so skipping is an optimization, never a
    * correctness gate. */
  def skipByStats(st: TableVersion, filters: Seq[org.apache.spark.sql.sources.Filter]): Seq[String] = {
    import org.apache.spark.sql.sources._
    import graft.relations.{ColStats, Stats}
    if (filters.isEmpty) return st.files
    def ord(c: String): Option[Ordering[String]] =
      st.schema.fields.find(_.name == c).map(_.dataType).flatMap(Stats.ordering)
    // a partition value is a one-row stat: min = max = the dir-encoded
    // value (string/numeric/boolean partition types only — canonical form
    // IS the path string for those; date/timestamp encodings differ)
    def partStats(f: String): Map[String, ColStats] = {
      val segs = f.split('/').dropRight(1).flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _           => None
      }).toMap
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      segs.flatMap { case (k, v) =>
        st.schema.fields.find(_.name == k).map(_.dataType) match {
          // the default-partition (null) marker stays conservative (kept)
          case _ if v == ExternalCatalogUtils.DEFAULT_PARTITION_NAME => None
          // string/numeric only: for these the path string IS the
          // canonical stats encoding (booleans/dates/timestamps differ)
          case Some(StringType | ByteType | ShortType | IntegerType | LongType |
                    FloatType | DoubleType) =>
            val canon = ExternalCatalogUtils.unescapePathName(v)
            Some(k -> ColStats(Some(canon), Some(canon), 0L, 1L))
          case _ => None
        }
      }
    }
    def mayMatch(cs: Map[String, ColStats], flt: Filter): Boolean = flt match {
      case And(l, r) => mayMatch(cs, l) && mayMatch(cs, r)
      case Or(l, r)  => mayMatch(cs, l) || mayMatch(cs, r)
      case EqualTo(c, v) => rangeOverlaps(cs, c, Stats.canonical(v), Stats.canonical(v))
      case In(c, vs) => vs.exists(v => rangeOverlaps(cs, c, Stats.canonical(v), Stats.canonical(v)))
      case GreaterThan(c, v)        => rangeOverlaps(cs, c, Stats.canonical(v), None)
      case GreaterThanOrEqual(c, v) => rangeOverlaps(cs, c, Stats.canonical(v), None)
      case LessThan(c, v)           => rangeOverlaps(cs, c, None, Stats.canonical(v))
      case LessThanOrEqual(c, v)    => rangeOverlaps(cs, c, None, Stats.canonical(v))
      case IsNull(c)    => cs.get(c).forall(s => s.nulls > 0)
      case IsNotNull(c) => cs.get(c).forall(s => s.nulls < s.rows || s.rows == 0)
      case _ => true
    }
    def rangeOverlaps(cs: Map[String, ColStats], c: String,
                      lo: Option[String], hi: Option[String]): Boolean =
      (cs.get(c), ord(c)) match {
        case (Some(s), Some(o)) =>
          (s.min, s.max) match {
            case (Some(mn), Some(mx)) =>
              lo.forall(l => o.gteq(mx, l)) && hi.forall(h => o.lteq(mn, h))
            case _ => s.rows == 0 || s.nulls < s.rows // all-null can't match a value
          }
        case _ => true // no stats / not comparable → keep
      }
    st.files.filter { f =>
      val cs = st.stats.getOrElse(f, Map.empty) ++ partStats(f)
      filters.forall(mayMatch(cs, _))
    }
  }

  /** Parse a file's `k=v` directory segments into an InternalRow laid out
    * per `partitionSchema` (catalyst-cast from the unescaped strings,
    * NULL for the Hive default-partition marker). */
  def partitionValues(relPath: String, partitionSchema: StructType): InternalRow = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.unsafe.types.UTF8String
    val pairs = relPath.split('/').dropRight(1).flatMap { seg =>
      seg.split("=", 2) match {
        case Array(k, v) => Some(ExternalCatalogUtils.unescapePathName(k) ->
          ExternalCatalogUtils.unescapePathName(v))
        case _ => None
      }
    }.toMap
    InternalRow.fromSeq(partitionSchema.fields.toSeq.map { f =>
      pairs.get(f.name) match {
        case None => null
        case Some(ExternalCatalogUtils.DEFAULT_PARTITION_NAME) => null
        case Some(s) => Cast(
          Literal(UTF8String.fromString(s),
            org.apache.spark.sql.types.StringType),
          f.dataType, Some(java.time.ZoneOffset.UTC.getId)).eval()
      }
    })
  }
}

class GraftSourceTable(dir: String, tableSchema: StructType,
                       pinnedVersion: Option[Int] = None,
                       bucketBy: Seq[String] = Nil, buckets: Int = 0,
                       tableName: Option[String] = None)
    extends Table with SupportsRead {
  override def name(): String = tableName.getOrElse(s"graft.`$dir`")
  override def schema(): StructType = tableSchema
  /** Declared layout: bucket transform (+ identity for partition dirs) —
    * what DESCRIBE shows and what the scan's KeyGroupedPartitioning echoes. */
  override def partitioning(): Array[Transform] = {
    val part = GraftSourceTable.resolve(dir, pinnedVersion).partitionBy
      .map(Expressions.identity)
    val bkt = if (buckets > 0) Seq(Expressions.bucket(buckets, bucketBy: _*)) else Nil
    (part ++ bkt).toArray
  }
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(dir, tableSchema, options, pinnedVersion)
}

class GraftScanBuilder(dir: String, schema: StructType,
                       options: CaseInsensitiveStringMap,
                       pinnedVersion: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Accept every filter for manifest file skipping + parquet row-group
    * pushdown, and hand them ALL back as residuals — file/row-group
    * granularity can't prove per-row satisfaction, so Spark re-applies. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter]):
      Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters; filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
  override def build(): Scan = new GraftScan(dir, schema, required,
    Option(options.get("versionAsOf")).map(_.toInt).orElse(pinnedVersion),
    Option(options.get("startingVersion")).map(_.toInt),
    pushed.toSeq)
}

class GraftScan(dir: String, tableSchema: StructType, required: StructType,
                versionAsOf: Option[Int], startingVersion: Option[Int],
                filters: Seq[org.apache.spark.sql.sources.Filter] = Nil)
    extends Scan with SupportsReportPartitioning {
  // Hive-layout split: partition columns live in dir names, not file bytes.
  // The shipped reader yields requiredData ++ requiredPart per row, so
  // readSchema() declares exactly that order (V2 maps attributes by name).
  private val st = GraftSourceTable.resolve(dir, versionAsOf)
  private val partitionBy = st.partitionBy
  private val fileDataSchema =
    StructType(tableSchema.fields.filterNot(f => partitionBy.contains(f.name)))
  private val requiredData =
    StructType(required.fields.filterNot(f => partitionBy.contains(f.name)))
  private val requiredPart =
    StructType(tableSchema.fields.filter(f =>
      partitionBy.contains(f.name) && required.fieldNames.contains(f.name)))

  override def readSchema(): StructType =
    StructType(requiredData.fields ++ requiredPart.fields)
  override def description(): String = s"GraftScan $dir"

  // filters on data columns push into the parquet reader (row-group
  // skipping); partition-column filters are satisfied at file level
  private val dataFilters = filters.filter(_.references.forall(r =>
    !partitionBy.contains(r)))

  // vectorized (ColumnarBatch) reads whenever Spark's own parquet reader
  // supports them for this schema — same decision FileSourceScanExec makes.
  // The streaming path stays row-based (its factory says so per partition).
  private def vectorized: Boolean =
    new ParquetFileFormat().supportBatch(SparkSession.active, readSchema())

  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    Scan.ColumnarSupportMode.PARTITION_DEFINED

  private def factory(batched: Boolean): PartitionReaderFactory =
    new GraftReaderFactory(GraftSourceTable.readFunction(
      fileDataSchema, requiredPart, requiredData, dataFilters,
      returningBatch = batched), batched)

  /** Post-skipping file set, fixed per Scan so the reported partitioning
    * and the planned partitions agree. Bucketed manifests attach each
    * file's bucket id as its partition key (HasPartitionKey), which is
    * what Spark groups on for storage-partitioned joins. */
  private lazy val planned: Array[InputPartition] =
    GraftFilePartition.forFiles(dir,
      GraftSourceTable.skipByStats(st, filters), requiredPart,
      bucketed = st.buckets > 0)

  /** Storage-partitioned-join contract: a bucketed manifest reports
    * KeyGroupedPartitioning over the `bucket(n, cols…)` transform. Spark
    * resolves the transform through the graft catalog's FunctionCatalog,
    * groups the planned files by bucket id, and elides the join shuffle
    * when the other side reports a compatible layout. Files missing a
    * bucket id (pre-bucketing history) degrade to UnknownPartitioning —
    * a correctness gate, never an error. */
  override def outputPartitioning(): Partitioning =
    if (st.buckets > 0 &&
        planned.forall(_.isInstanceOf[GraftBucketedFilePartition])) {
      val groups = planned
        .collect { case b: GraftBucketedFilePartition => b.bucket }.distinct.length
      new KeyGroupedPartitioning(
        Array(Expressions.bucket(st.buckets, st.bucketBy: _*)), groups)
    } else new UnknownPartitioning(planned.length)

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = planned
    override def createReaderFactory(): PartitionReaderFactory =
      factory(batched = vectorized)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(dir, () => factory(batched = false),
      requiredPart, startingVersion)
}

/** Offsets are commit-log versions; a microbatch is the files the interval
  * (start, end] added. Append-only contract like readChanges: rewritten
  * files replay their rows. */
class GraftMicroBatchStream(dir: String, factory: () => PartitionReaderFactory,
                            requiredPart: StructType, startingVersion: Option[Int])
    extends MicroBatchStream {
  private def log = GraftSourceTable.log(dir)
  override def initialOffset(): Offset =
    GraftVersionOffset(startingVersion.getOrElse(0))
  override def latestOffset(): Offset =
    GraftVersionOffset(log.currentVersion.getOrElse(0))
  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toInt)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].version
    val e = end.asInstanceOf[GraftVersionOffset].version
    if (e <= s) Array.empty
    else {
      val before = if (s <= 0) Set.empty[String] else log.read(s).files.toSet
      val after = log.read(e)
      GraftFilePartition.forFiles(dir, after.files.filterNot(before), requiredPart)
    }
  }
  override def createReaderFactory(): PartitionReaderFactory = factory()
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class GraftVersionOffset(version: Int) extends Offset {
  override def json(): String = version.toString
}

sealed trait GraftInputPartition extends InputPartition {
  def path: String
  def length: Long
  def partitionValues: InternalRow
}
case class GraftFilePartition(path: String, length: Long,
                              partitionValues: InternalRow) extends GraftInputPartition
/** A bucketed manifest file: its bucket id is the partition key Spark
  * groups on for storage-partitioned joins. */
case class GraftBucketedFilePartition(path: String, length: Long,
                                      partitionValues: InternalRow, bucket: Int)
    extends GraftInputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bucket))
}
object GraftFilePartition {
  /** One partition per manifest file; partition values parse on the driver
    * at plan time (the relative path carries the `k=v` segments). */
  def forFiles(dir: String, files: Seq[String],
               partitionSchema: StructType,
               bucketed: Boolean = false): Array[InputPartition] =
    files.map { f =>
      val p = java.nio.file.Paths.get(dir, f)
      val uri = p.toUri.toString
      val size = java.nio.file.Files.size(p)
      val pv = GraftSourceTable.partitionValues(f, partitionSchema)
      graft.relations.RelationManager.bucketIdOf(f) match {
        case Some(b) if bucketed => GraftBucketedFilePartition(uri, size, pv, b)
        case _                   => GraftFilePartition(uri, size, pv)
      }
    }.toArray[InputPartition]
}

/** Wraps the shipped decode function. In row mode it unwraps any stray
  * ColumnarBatch the way FileScanRDD does; in batched mode it serves
  * ColumnarBatches directly to the vectorized scan. */
class GraftReaderFactory(fn: PartitionedFile => Iterator[InternalRow],
                         batched: Boolean = false)
    extends PartitionReaderFactory {

  private def open(partition: InputPartition): Iterator[Any] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    fn(PartitionedFile(p.partitionValues,
      SparkPath.fromUrlString(p.path), 0L, p.length))
  }

  override def supportColumnarReads(partition: InputPartition): Boolean = batched

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows: Iterator[InternalRow] = open(partition).flatMap {
      case b: ColumnarBatch => b.rowIterator().asScala
      case r => Iterator.single(r.asInstanceOf[InternalRow])
    }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val batches = open(partition).map(_.asInstanceOf[ColumnarBatch])
    new PartitionReader[ColumnarBatch] {
      private var current: ColumnarBatch = _
      override def next(): Boolean =
        if (batches.hasNext) { current = batches.next(); true } else false
      override def get(): ColumnarBatch = current
      override def close(): Unit = ()
    }
  }
}
