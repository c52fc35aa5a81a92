package org.apache.spark.sql.graft.source

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
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
                        properties: JMap[String, String]): Table =
    new GraftSourceTable(properties.get("path"), schema)
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
                   requiredData: StructType):
      PartitionedFile => Iterator[InternalRow] = {
    val spark = SparkSession.active
    new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, dataSchema, partitionSchema, requiredData,
      Seq.empty,
      // row-iterator mode: the V2 reader consumes InternalRows (the
      // columnar fast path needs SupportsBatch plumbing — a later step)
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      spark.sessionState.newHadoopConf())
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

class GraftSourceTable(dir: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft.`$dir`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(dir, tableSchema, options)
}

class GraftScanBuilder(dir: String, schema: StructType,
                       options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftScan(dir, schema, required,
    Option(options.get("versionAsOf")).map(_.toInt),
    Option(options.get("startingVersion")).map(_.toInt))
}

class GraftScan(dir: String, tableSchema: StructType, required: StructType,
                versionAsOf: Option[Int], startingVersion: Option[Int])
    extends Scan {
  // Hive-layout split: partition columns live in dir names, not file bytes.
  // The shipped reader yields requiredData ++ requiredPart per row, so
  // readSchema() declares exactly that order (V2 maps attributes by name).
  private val partitionBy =
    GraftSourceTable.resolve(dir, versionAsOf).partitionBy
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

  private def factory(): PartitionReaderFactory =
    new GraftReaderFactory(GraftSourceTable.readFunction(
      fileDataSchema, requiredPart, requiredData))

  override def toBatch: Batch = new Batch {
    private val st = GraftSourceTable.resolve(dir, versionAsOf)
    override def planInputPartitions(): Array[InputPartition] =
      GraftFilePartition.forFiles(dir, st.files, requiredPart)
    override def createReaderFactory(): PartitionReaderFactory = factory()
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(dir, () => factory(), requiredPart, startingVersion)
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

case class GraftFilePartition(path: String, length: Long,
                              partitionValues: InternalRow) extends InputPartition
object GraftFilePartition {
  /** One partition per manifest file; partition values parse on the driver
    * at plan time (the relative path carries the `k=v` segments). */
  def forFiles(dir: String, files: Seq[String],
               partitionSchema: StructType): Array[InputPartition] =
    files.map { f =>
      val p = java.nio.file.Paths.get(dir, f)
      GraftFilePartition(p.toUri.toString, java.nio.file.Files.size(p),
        GraftSourceTable.partitionValues(f, partitionSchema))
    }.toArray[InputPartition]
}

/** Wraps the shipped decode function; unwraps the vectorized reader's
  * ColumnarBatch-as-InternalRow convention the same way FileScanRDD does. */
class GraftReaderFactory(fn: PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFilePartition]
    val pf = PartitionedFile(p.partitionValues,
      SparkPath.fromUrlString(p.path), 0L, p.length)
    val raw: Iterator[Any] = fn(pf)
    val rows: Iterator[InternalRow] = raw.flatMap {
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
}
