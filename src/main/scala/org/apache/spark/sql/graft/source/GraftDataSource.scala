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

  /** Resolve a version's state; partitioned tables are unsupported here. */
  def resolve(dir: String, versionAsOf: Option[Int]): TableVersion = {
    val l = log(dir)
    val v = versionAsOf.orElse(l.currentVersion).getOrElse(
      throw new IllegalArgumentException(s"no graft commit log under $dir"))
    val st = l.read(v)
    require(st.partitionBy.isEmpty,
      s"graft source: partitioned table $dir not supported — read via RelationManager")
    st
  }

  /** The driver-built, executor-shipped parquet decode function —
    * exactly what FileSourceScanExec hands to FileScanRDD. */
  def readFunction(dataSchema: StructType, requiredSchema: StructType):
      PartitionedFile => Iterator[InternalRow] = {
    val spark = SparkSession.active
    new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, dataSchema, new StructType(), requiredSchema,
      Seq.empty,
      // row-iterator mode: the V2 reader consumes InternalRows (the
      // columnar fast path needs SupportsBatch plumbing — a later step)
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      spark.sessionState.newHadoopConf())
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

class GraftScan(dir: String, dataSchema: StructType, required: StructType,
                versionAsOf: Option[Int], startingVersion: Option[Int])
    extends Scan {
  override def readSchema(): StructType = required
  override def description(): String = s"GraftScan $dir"

  override def toBatch: Batch = new Batch {
    private val st = GraftSourceTable.resolve(dir, versionAsOf)
    override def planInputPartitions(): Array[InputPartition] =
      GraftFilePartition.forFiles(dir, st.files)
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftReaderFactory(GraftSourceTable.readFunction(dataSchema, required))
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(dir, dataSchema, required, startingVersion)
}

/** Offsets are commit-log versions; a microbatch is the files the interval
  * (start, end] added. Append-only contract like readChanges: rewritten
  * files replay their rows. */
class GraftMicroBatchStream(dir: String, dataSchema: StructType,
                            required: StructType, startingVersion: Option[Int])
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
      require(after.partitionBy.isEmpty,
        s"graft stream: partitioned table $dir not supported")
      GraftFilePartition.forFiles(dir, after.files.filterNot(before))
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(GraftSourceTable.readFunction(dataSchema, required))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class GraftVersionOffset(version: Int) extends Offset {
  override def json(): String = version.toString
}

case class GraftFilePartition(path: String, length: Long) extends InputPartition
object GraftFilePartition {
  def forFiles(dir: String, files: Seq[String]): Array[InputPartition] =
    files.map { f =>
      val p = java.nio.file.Paths.get(dir, f)
      GraftFilePartition(p.toUri.toString, java.nio.file.Files.size(p))
    }.toArray[InputPartition]
}

/** Wraps the shipped decode function; unwraps the vectorized reader's
  * ColumnarBatch-as-InternalRow convention the same way FileScanRDD does. */
class GraftReaderFactory(fn: PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFilePartition]
    val pf = PartitionedFile(InternalRow.empty,
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
