package org.apache.spark.sql.graft.source

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsDeleteV2, SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
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

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val base = GraftSourceTable.resolve(tablePath(options),
      Option(options.get("versionAsOf")).map(_.toInt)).schema
    if (Option(options.get("readChangeFeed")).exists(_.toBoolean))
      GraftChangeFeed.outputSchema(base)
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val dir = properties.get("path")
    val st = GraftSourceTable.resolve(dir,
      Option(properties.get("versionAsOf")).map(_.toInt))
    new GraftSourceTable(dir, schema, bucketBy = st.bucketBy, buckets = st.buckets)
  }
}

object GraftSourceTable {
  /** Metadata column: the table-relative path of the row's data file —
    * what Spark groups on for copy-on-write row-level operations
    * (DELETE/UPDATE/MERGE rewrite exactly the affected files). */
  val FileCol = "_file"

  /** Metadata column: absolute row position within the data file — the
    * second half of the merge-on-read row identity (_file, _pos). */
  val PosCol = "_pos"

  /** Schema of a merge-on-read delete file: dead row positions, keyed by
    * table-relative data file path. */
  val DeleteSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("pos", org.apache.spark.sql.types.LongType, nullable = false)))

  /** Store for the connector's manifest and plan-time file I/O. Pluggable
    * via `spark.graft.filestore` for warehouses on an object store:
    * `local` (default), `hadoop` ([[graft.relations.HadoopFileStore]] —
    * resolves each path's FileSystem through the session Hadoop conf), or
    * a FileStore class name with a no-arg constructor. */
  def store(dir: String): graft.relations.FileStore = {
    val conf =
      try org.apache.spark.sql.SparkSession.active.conf
        .get("spark.graft.filestore", "auto")
      catch { case _: IllegalStateException => "auto" } // no active session
    conf match {
      // auto: derived from the TABLE PATH's shape — URI dirs (s3a://…)
      // route through the Hadoop FS API with zero configuration
      case "" | "auto"  => graft.relations.FileStore.forRoot(dir)
      case "local"      => new LocalFileStore
      case "hadoop"     => new graft.relations.HadoopFileStore()
      case cls => Class.forName(cls).getDeclaredConstructor()
        .newInstance().asInstanceOf[graft.relations.FileStore]
    }
  }

  def log(dir: String): CommitLog =
    new CommitLog(store(dir), graft.relations.WarehouseIO.join(dir, "_graft_log"))

  /** Scan-partition URI for a table-relative file: URI dirs join as
    * strings (they ARE the URI), local dirs — including `file:`-scheme
    * spellings, which Spark's LOCATION canonicalization emits with a
    * single slash — go through localPath so the scheme never gets
    * re-prefixed into a relative ./file: path. */
  def fileUri(dir: String, f: String): String =
    if (graft.relations.WarehouseIO.isUri(dir)) graft.relations.WarehouseIO.join(dir, f)
    else graft.relations.WarehouseIO.localPath(
      graft.relations.WarehouseIO.join(dir, f)).toUri.toString

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
    if (filters.isEmpty) return st.files
    st.files.filter { f =>
      val cs = combinedStats(st, f)
      filters.forall(mayMatch(st, cs, _))
    }
  }

  /** A file's manifest stats merged with its dir-encoded partition values
    * (a partition value is a one-row stat: min = max = the value;
    * string/numeric partition types only — for those the path string IS
    * the canonical stats encoding; booleans/dates/timestamps differ). */
  def combinedStats(st: TableVersion, f: String): Map[String, graft.relations.ColStats] = {
    import graft.relations.ColStats
    val segs = f.split('/').dropRight(1).flatMap(_.split("=", 2) match {
      case Array(k, v) => Some(k -> v)
      case _           => None
    }).toMap
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val part = segs.flatMap { case (k, v) =>
      st.schema.fields.find(_.name == k).map(_.dataType) match {
        // the default-partition (null) marker stays conservative (no stat)
        case _ if v == ExternalCatalogUtils.DEFAULT_PARTITION_NAME => None
        case Some(StringType | ByteType | ShortType | IntegerType | LongType |
                  FloatType | DoubleType) =>
          val canon = ExternalCatalogUtils.unescapePathName(v)
          Some(k -> ColStats(Some(canon), Some(canon), 0L, 1L))
        case _ => None
      }
    }
    st.stats.getOrElse(f, Map.empty) ++ part
  }

  private def ord(st: TableVersion, c: String): Option[Ordering[String]] = {
    import graft.relations.Stats
    st.schema.fields.find(_.name == c).map(_.dataType).flatMap(Stats.ordering)
  }

  /** "Some row of this file MAY satisfy `flt`" — false only on proof of
    * impossibility (the data-skipping direction; conservative default true). */
  def mayMatch(st: TableVersion, cs: Map[String, graft.relations.ColStats],
               flt: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    import graft.relations.Stats
    def rangeOverlaps(c: String, lo: Option[String], hi: Option[String]): Boolean =
      (cs.get(c), ord(st, c)) match {
        case (Some(s), Some(o)) =>
          (s.min, s.max) match {
            case (Some(mn), Some(mx)) =>
              lo.forall(l => o.gteq(mx, l)) && hi.forall(h => o.lteq(mn, h))
            case _ => s.rows == 0 || s.nulls < s.rows // all-null can't match a value
          }
        case _ => true // no stats / not comparable → keep
      }
    flt match {
      case And(l, r) => mayMatch(st, cs, l) && mayMatch(st, cs, r)
      case Or(l, r)  => mayMatch(st, cs, l) || mayMatch(st, cs, r)
      case EqualTo(c, v) => rangeOverlaps(c, Stats.canonical(v), Stats.canonical(v))
      case In(c, vs) => vs.exists(v => rangeOverlaps(c, Stats.canonical(v), Stats.canonical(v)))
      case GreaterThan(c, v)        => rangeOverlaps(c, Stats.canonical(v), None)
      case GreaterThanOrEqual(c, v) => rangeOverlaps(c, Stats.canonical(v), None)
      case LessThan(c, v)           => rangeOverlaps(c, None, Stats.canonical(v))
      case LessThanOrEqual(c, v)    => rangeOverlaps(c, None, Stats.canonical(v))
      case IsNull(c)    => cs.get(c).forall(s => s.nulls > 0)
      case IsNotNull(c) => cs.get(c).forall(s => s.nulls < s.rows || s.rows == 0)
      case _ => true
    }
  }

  /** "EVERY row of this file satisfies `flt`" — the metadata-delete proof
    * (conservative default false; the dual of [[mayMatch]]). Sound use of
    * the one-row partition stats: their min/max/nulls are exact claims
    * about every row, only `rows` is a placeholder, and no rule below
    * reads `rows` except against `nulls` from the same real stat. */
  def mustMatch(st: TableVersion, cs: Map[String, graft.relations.ColStats],
                flt: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    import graft.relations.Stats
    // a zero-row file satisfies anything vacuously. `exists`, not
    // `headOption`: in a map mixing real stats with partition pseudo-stats
    // (whose `rows` is a 1-row placeholder) headOption is nondeterministic
    // and could hide the empty-file proof behind a pseudo-stat; only real
    // stats can carry rows == 0, and a real rows == 0 means the file IS
    // empty, so any-match is sound.
    if (cs.values.exists(_.rows == 0L)) return true
    def bound(c: String)(p: (Ordering[String], graft.relations.ColStats) => Boolean): Boolean =
      (cs.get(c), ord(st, c)) match {
        case (Some(s), Some(o)) => s.nulls == 0L && p(o, s)
        case _                  => false
      }
    def allEq(c: String, v: Any): Boolean = Stats.canonical(v) match {
      case None => false
      case Some(cv) => bound(c) { (o, s) =>
        (s.min, s.max) match {
          case (Some(mn), Some(mx)) => o.equiv(mn, cv) && o.equiv(mx, cv)
          case _                    => false
        }
      }
    }
    def cmp(c: String, v: Any, takeMin: Boolean)(
        ok: (Ordering[String], String, String) => Boolean): Boolean =
      Stats.canonical(v) match {
        case None => false
        case Some(cv) => bound(c) { (o, s) =>
          (if (takeMin) s.min else s.max).exists(b => ok(o, b, cv))
        }
      }
    flt match {
      case And(l, r)     => mustMatch(st, cs, l) && mustMatch(st, cs, r)
      case Or(l, r)      => mustMatch(st, cs, l) || mustMatch(st, cs, r)
      case Not(x)        =>
        // "no row satisfies x" alone is NOT enough: on a NULL the
        // predicate x is NULL, so NOT x is NULL too — the row satisfies
        // neither (3VL; a property test caught exactly this on an
        // all-null file). Proving NOT x for every row needs x to be
        // two-valued on every row: zero nulls in every referenced column.
        !mayMatch(st, cs, x) &&
          x.references.forall(c => cs.get(c).exists(_.nulls == 0L))
      case AlwaysTrue()  => true
      case AlwaysFalse() => false
      case EqualTo(c, v) => allEq(c, v)
      case In(c, vs)     => vs.exists(v => allEq(c, v))
      case GreaterThan(c, v)        => cmp(c, v, takeMin = true)((o, b, cv) => o.gt(b, cv))
      case GreaterThanOrEqual(c, v) => cmp(c, v, takeMin = true)((o, b, cv) => o.gteq(b, cv))
      case LessThan(c, v)           => cmp(c, v, takeMin = false)((o, b, cv) => o.lt(b, cv))
      case LessThanOrEqual(c, v)    => cmp(c, v, takeMin = false)((o, b, cv) => o.lteq(b, cv))
      case IsNull(c)    => cs.get(c).exists(s => s.nulls == s.rows && s.rows > 0)
      case IsNotNull(c) => cs.get(c).exists(_.nulls == 0L)
      case _ => false
    }
  }

  /** Decode a canonical stats string (see `Stats.canonical`) back to the
    * catalyst-internal value for `dt`. Total for every type `Stats
    * .ordering` covers, so "has an ordering" implies "decodable". */
  private def fromCanonical(s: String, dt: DataType): Any = dt match {
    case StringType                       => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case ByteType                         => s.toByte
    case ShortType                        => s.toShort
    case IntegerType | DateType           => s.toInt
    case LongType | TimestampType | TimestampNTZType => s.toLong
    case BooleanType                      => s == "1"
    case FloatType                        => s.toFloat
    case DoubleType                       => s.toDouble
    case d: DecimalType =>
      org.apache.spark.sql.types.Decimal(BigDecimal(s), d.precision, d.scale)
    case other => throw new IllegalStateException(s"not stats-decodable: $other")
  }

  /** Try to answer an aggregation entirely from the version manifest.
    * Some((schema, row)) when EVERY aggregate resolves: no residual
    * filters, no grouping, and every file carries the needed stats.
    * COUNT(*) sums per-file row counts, COUNT(col) subtracts null counts,
    * MIN/MAX fold per-file bounds under the column type's ordering
    * (all-null columns yield SQL NULL, matching Spark's aggregate). */
  def aggregateFromStats(
      dir: String, versionAsOf: Option[Int],
      pushedFilters: Array[org.apache.spark.sql.sources.Filter],
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation):
      Option[(StructType, InternalRow)] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    import graft.relations.{ColStats, Stats}
    if (pushedFilters.nonEmpty || agg.groupByExpressions.nonEmpty) return None
    val st = resolve(dir, versionAsOf)
    // merge-on-read deletes make manifest stats over-claims: counts include
    // dead rows and a min/max row may itself be dead — decline
    if (st.deletes.nonEmpty) return None
    def colName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames.head)
        case _ => None
      }
    // stats for `c` in EVERY file, else None (a stat-less file hides rows)
    def colStats(c: String): Option[Seq[ColStats]] = {
      val per = st.files.map(f => st.stats.get(f).flatMap(_.get(c)))
      if (per.forall(_.isDefined)) Some(per.flatten) else None
    }
    def dtOf(c: String): Option[DataType] =
      st.schema.fields.find(_.name == c).map(_.dataType)
    def minMax(e: org.apache.spark.sql.connector.expressions.Expression,
               isMin: Boolean): Option[(StructField, Any)] =
      for {
        name <- colName(e)
        dt <- dtOf(name)
        ord <- Stats.ordering(dt)
        ss <- colStats(name)
      } yield {
        val bounds = ss.flatMap(s => if (isMin) s.min else s.max)
        val v = if (bounds.isEmpty) null
                else fromCanonical(
                  if (isMin) bounds.min(ord) else bounds.max(ord), dt)
        (StructField(s"${if (isMin) "min" else "max"}($name)", dt), v)
      }
    val answers: Seq[Option[(StructField, Any)]] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        val per = st.files.map(f => st.stats.get(f).flatMap(_.values.headOption))
        if (per.forall(_.isDefined))
          Some((StructField("count(*)", LongType, nullable = false),
            per.flatten.map(_.rows).sum: Any))
        else None
      case c: Count if !c.isDistinct =>
        for { name <- colName(c.column); ss <- colStats(name) }
          yield (StructField(s"count($name)", LongType, nullable = false),
            ss.map(s => s.rows - s.nulls).sum: Any)
      case m: Min => minMax(m.column, isMin = true)
      case m: Max => minMax(m.column, isMin = false)
      case _ => None
    }
    if (answers.exists(_.isEmpty)) None
    else {
      val resolved = answers.flatten
      Some((StructType(resolved.map(_._1)),
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          resolved.map(_._2).toArray)))
    }
  }

  /** Parse a file's `k=v` directory segments into an InternalRow laid out
    * per `partitionSchema` (catalyst-cast from the unescaped strings,
    * NULL for the Hive default-partition marker). Timestamp-ish values
    * parse under the SESSION timezone — the same convention Spark's own
    * file sources use for dir-encoded values, and what the engine (which
    * pins UTC in its entry points) writes. */
  def partitionValues(relPath: String, partitionSchema: StructType,
                      timeZone: String = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone): InternalRow = {
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
          f.dataType, Some(timeZone)).eval()
      }
    })
  }
}

class GraftSourceTable(dir: String, tableSchema: StructType,
                       pinnedVersion: Option[Int] = None,
                       bucketBy: Seq[String] = Nil, buckets: Int = 0,
                       tableName: Option[String] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsDeleteV2
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {
  override def name(): String = tableName.getOrElse(s"graft.`$dir`")
  override def schema(): StructType = tableSchema

  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(GraftFileMetadataColumn, GraftPosMetadataColumn)

  /** SQL DELETE (unprovable predicates) / UPDATE / MERGE INTO: group-based
    * copy-on-write — Spark's runtime group filter narrows the scan to the
    * files holding matching rows (via the `_file` metadata column), the
    * replacement rows are computed relationally, and ONE commit swaps
    * exactly those files (the engine's commitReplace shape, driven from
    * plain SQL). Provable DELETEs still collapse to the metadata-only
    * path via Spark's own optimizer rule. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo):
      org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(pinnedVersion.isEmpty,
      s"cannot modify a time-travel (VERSION AS OF) relation: ${name()}")
    // row_level_mode = merge-on-read switches DML to SupportsDelta
    // (positional delete files, O(delta) writes); default stays
    // copy-on-write — the right default for parquet read paths
    () =>
      if (GraftSourceTable.resolve(dir, None).props
          .get("row_level_mode").contains("merge-on-read"))
        new GraftDeltaOperation(dir, tableSchema, info.command())
      else new GraftRowLevelOperation(dir, tableSchema, info.command())
  }
  /** Declared layout: bucket transform (+ identity for partition dirs) —
    * what DESCRIBE shows and what the scan's KeyGroupedPartitioning echoes. */
  override def partitioning(): Array[Transform] = {
    val part = GraftSourceTable.resolve(dir, pinnedVersion).partitionBy
      .map(Expressions.identity)
    val bkt = if (buckets > 0) Seq(Expressions.bucket(buckets, bucketBy: _*)) else Nil
    (part ++ bkt).toArray
  }
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_DYNAMIC).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(dir, tableSchema, options, pinnedVersion)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty,
      s"cannot write to a time-travel (VERSION AS OF) relation: ${name()}")
    // catalog-resolved tables can request bucket-transform clustering (the
    // catalog serves the bucket function); path-based ones cannot
    new GraftWriteBuilder(dir, info, viaCatalog = tableName.isDefined)
  }

  // ---- metadata-only DELETE / TRUNCATE (the Iceberg metadata-delete move:
  // a predicate every file provably all-matches or none-matches — partition
  // values or clustered stats — deletes by dropping manifest entries,
  // touching zero data bytes at any table size)

  // proof cache: Spark calls canDeleteWhere immediately before deleteWhere
  // with the same predicates — avoid resolving the table and scoring every
  // file twice (keyed by predicate renderings + resolved version)
  @volatile private var proofCache: Option[(Seq[String], Int, Option[Seq[String]])] = None

  private def deleteProof(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]):
      Option[Seq[String]] = {
    import org.apache.spark.sql.internal.connector.PredicateUtils
    val v1 = predicates.map(PredicateUtils.toV1)
    if (v1.exists(_.isEmpty)) return None
    val filters = v1.flatten.toSeq
    val st = GraftSourceTable.resolve(dir, None)
    val key = predicates.map(_.toString).toSeq
    proofCache match {
      case Some((k, v, res)) if k == key && v == st.version => return res
      case _ => ()
    }
    val verdicts = st.files.map { f =>
      val cs = GraftSourceTable.combinedStats(st, f)
      val all = filters.forall(GraftSourceTable.mustMatch(st, cs, _))
      val none = !filters.forall(GraftSourceTable.mayMatch(st, cs, _))
      (f, all, none)
    }
    val res =
      if (verdicts.forall { case (_, all, none) => all || none })
        Some(verdicts.collect { case (f, true, _) => f })
      else None
    proofCache = Some((key, st.version, res))
    res
  }

  override def canDeleteWhere(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Boolean =
    pinnedVersion.isEmpty && deleteProof(predicates).isDefined

  override def deleteWhere(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    val doomed = deleteProof(predicates).getOrElse(throw new UnsupportedOperationException(
      s"DELETE on ${name()}: cannot prove all-or-nothing row matches per file " +
        "from manifest stats/partition values — rewrite via the engine's merge/delete+insert")).toSet
    // operation-statement replay guard (r18): a resumed run re-running an
    // already-committed metadata DELETE skips it
    if (GraftOpTxn.alreadyCommitted(GraftSourceTable.log(dir))) return
    if (doomed.nonEmpty)
      // same conflict rule as every read-modify-write commit: the proof
      // was computed against a snapshot; if a concurrent commit replaced
      // any doomed file, silently filterNot-ing would "succeed" while the
      // replacement's copies of the rows survive — abort instead
      try GraftSourceTable.log(dir).commit(None, None, None, None, Map.empty,
        GraftOpTxn.current) { cur =>
        val vanished = doomed -- cur.toSet
        if (vanished.nonEmpty) throw new java.util.ConcurrentModificationException(
          s"DELETE on ${name()}: files proven deletable were replaced by a " +
            s"concurrent commit (${vanished.take(3).mkString(", ")}…) — retry")
        cur.filterNot(doomed)
      }
      catch { case _: graft.relations.StaleTxnException => () }
  }

  override def truncateTable(): Boolean = {
    require(pinnedVersion.isEmpty,
      s"cannot truncate a time-travel (VERSION AS OF) relation: ${name()}")
    GraftSourceTable.log(dir).commit(None, None, None, None, Map.empty)(_ => Nil)
    true
  }
}

/** The `_file` metadata column (`SELECT _file, * FROM t` works too). */
object GraftFileMetadataColumn extends org.apache.spark.sql.connector.catalog.MetadataColumn {
  override def name(): String = GraftSourceTable.FileCol
  override def dataType(): org.apache.spark.sql.types.DataType = StringType
  override def isNullable: Boolean = false
  override def comment(): String = "table-relative path of the row's data file"
}

/** The `_pos` metadata column: the row's absolute position within its data
  * file, generated by Spark's parquet reader (row-index mechanism), so it
  * stays correct under filter pushdown and row-group pruning. Together
  * with `_file` it is the row identity merge-on-read deletes address. */
object GraftPosMetadataColumn extends org.apache.spark.sql.connector.catalog.MetadataColumn {
  override def name(): String = GraftSourceTable.PosCol
  override def dataType(): org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.LongType
  override def isNullable: Boolean = false
  override def comment(): String = "row position within the data file"
}

class GraftScanBuilder(dir: String, schema: StructType,
                       options: CaseInsensitiveStringMap,
                       pinnedVersion: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates
    with SupportsPushDownLimit {
  private var required: StructType = schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var aggAnswer: Option[(StructType, InternalRow)] = None
  private var limit: Option[Int] = None
  private def versionAsOf: Option[Int] =
    Option(options.get("versionAsOf")).map(_.toInt).orElse(pinnedVersion)
  private def changeFeed: Boolean =
    Option(options.get("readChangeFeed")).exists(_.toBoolean)
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

  /** Metadata-only aggregation (the Delta/Iceberg "answer from stats"
    * move): an unfiltered, ungrouped COUNT(*) / COUNT(col) / MIN(col) /
    * MAX(col) whose every manifest file carries the needed stats is
    * answered on the driver from the version manifest — zero data I/O,
    * whether the table is 60k rows or 100 TB. Any gap (a filter, a
    * grouping, a stat-less file, a non-comparable type) declines the
    * pushdown and the scan proceeds normally; partial pushdown is always
    * declined because file stats can't produce per-partition rows. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    !changeFeed &&
      GraftSourceTable.aggregateFromStats(dir, versionAsOf, pushed, agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (changeFeed) return false
    aggAnswer = GraftSourceTable.aggregateFromStats(dir, versionAsOf, pushed, agg)
    aggAnswer.isDefined
  }

  /** LIMIT n over a table whose files all carry row counts scans only a
    * file prefix totalling ≥ n rows (partial push: Spark still applies
    * the exact limit). A 100 TB `LIMIT 10` opens one file. */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); !changeFeed }
  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan = {
    if (changeFeed) {
      val st = GraftSourceTable.resolve(dir, None)
      // Delta CDF semantics (this surface mirrors its option names, so it
      // mirrors its contract): startingVersion and endingVersion are both
      // INCLUSIVE, batch reads REQUIRE an explicit start, and a stream
      // without one tails from the current version. Internally the planner
      // still thinks in (fromExclusive, to].
      val start = Option(options.get("startingVersion")).map(_.toInt)
      val to = Option(options.get("endingVersion")).map(_.toInt)
        .orElse(GraftSourceTable.log(dir).currentVersion).getOrElse(0)
      return new GraftChangeFeedScan(dir, st, start, to)
    }
    aggAnswer match {
      case Some((outSchema, row)) => new GraftStatsLocalScan(dir, outSchema, row)
      case None => new GraftScan(dir, schema, required,
        versionAsOf,
        Option(options.get("startingVersion")).map(_.toInt),
        pushed.toSeq, limit,
        Option(options.get("maxFilesPerTrigger")).map(_.toInt))
    }
  }
}

/** A fully-pushed aggregate: the result row was computed from the version
  * manifest at plan time; Spark turns this into a local scan — the query
  * never touches an executor. */
class GraftStatsLocalScan(dir: String, outSchema: StructType, row: InternalRow)
    extends LocalScan {
  override def rows(): Array[InternalRow] = Array(row)
  override def readSchema(): StructType = outSchema
  override def description(): String = s"GraftStatsLocalScan $dir"
}

class GraftScan(dir: String, tableSchema: StructType, required: StructType,
                versionAsOf: Option[Int], startingVersion: Option[Int],
                filters: Seq[org.apache.spark.sql.sources.Filter] = Nil,
                limit: Option[Int] = None,
                maxFilesPerTrigger: Option[Int] = None)
    extends Scan with SupportsReportPartitioning {
  // Hive-layout split: partition columns live in dir names, not file bytes.
  // The shipped reader yields requiredData ++ requiredPart per row, so
  // readSchema() declares exactly that order (V2 maps attributes by name).
  protected val st = GraftSourceTable.resolve(dir, versionAsOf)
  private val partitionBy = st.partitionBy
  // the `_file`/`_pos` metadata columns (SupportsMetadataColumns) are
  // served by the reader wrapper, not the parquet bytes — strip them from
  // the data split
  private val wantFile = required.fieldNames.contains(GraftSourceTable.FileCol)
  private val wantPos = required.fieldNames.contains(GraftSourceTable.PosCol)
  private val metaCols = Set(GraftSourceTable.FileCol, GraftSourceTable.PosCol)
  private val requiredCols =
    StructType(required.fields.filterNot(f => metaCols.contains(f.name)))
  private val fileDataSchema =
    StructType(tableSchema.fields.filterNot(f => partitionBy.contains(f.name)))
  private val requiredData =
    StructType(requiredCols.fields.filterNot(f => partitionBy.contains(f.name)))
  private val requiredPart =
    StructType(tableSchema.fields.filter(f =>
      partitionBy.contains(f.name) && requiredCols.fieldNames.contains(f.name)))

  // merge-on-read: row positions are needed whenever _pos is requested OR
  // any planned file carries positional deletes (the read-side anti-merge
  // filters by position). The parquet reader generates them itself via the
  // row-index mechanism — exact under pushdown and row-group pruning.
  private def scanHasDeletes: Boolean = st.deletes.nonEmpty
  private def needPos: Boolean = wantPos || scanHasDeletes

  override def readSchema(): StructType =
    StructType(requiredData.fields ++ requiredPart.fields ++
      (if (wantFile)
        Seq(StructField(GraftSourceTable.FileCol, StringType, nullable = false))
      else Nil) ++
      (if (wantPos)
        Seq(StructField(GraftSourceTable.PosCol,
          org.apache.spark.sql.types.LongType, nullable = false))
      else Nil))
  override def description(): String = s"GraftScan $dir"

  // filters on data columns push into the parquet reader (row-group
  // skipping); partition-column filters are satisfied at file level.
  // Row-level operation scans OVERRIDE this to Nil: their contract is to
  // return EVERY row of each matching file (the rewrite swaps whole
  // files), so a pushed command condition may prune files but must never
  // reach the parquet reader — row-group/record-level filtering there
  // would silently drop surviving rows from the replacement.
  protected def parquetFilters: Seq[org.apache.spark.sql.sources.Filter] =
    filters.filter(_.references.forall(r =>
      !partitionBy.contains(r) && r != GraftSourceTable.FileCol &&
        r != GraftSourceTable.PosCol)) // metadata cols aren't in file bytes

  // vectorized (ColumnarBatch) reads whenever Spark's own parquet reader
  // supports them for this schema — same decision FileSourceScanExec makes.
  // The streaming path stays row-based (its factory says so per partition),
  // and so do reads appending the `_file`/`_pos` metadata columns and
  // partitions carrying merge-on-read deletes (row-level filtering).
  private def vectorized: Boolean =
    !wantFile && !wantPos && st.deletes.isEmpty && // Spark forbids mixing
      // row-based and columnar partitions, so one dirty file row-modes the
      // whole scan (compaction restores the vectorized path)
      new ParquetFileFormat().supportBatch(SparkSession.active, readSchema())

  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    Scan.ColumnarSupportMode.PARTITION_DEFINED

  private def factory(batched: Boolean): PartitionReaderFactory = {
    // clean partitions (no deletes) in batch mode use the plain function;
    // dirty/metadata partitions use the row function whose required data
    // carries the parquet row-index column (absolute row position)
    val rowRequired =
      if (needPos)
        // the exact field FileSourceStrategy requests for _metadata
        // .row_index: the internal temp name + the generated-metadata
        // marker, which makes the parquet readers GENERATE the column
        // instead of demanding it from the file bytes
        StructType(requiredData.fields :+ ParquetFileFormat.ROW_INDEX_FIELD
          .copy(name = ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
            // nullable: the readers treat it as a missing-from-file column
            // (checkColumn tolerates optional ones) and then GENERATE it —
            // the row-index machinery keys on the name + LongType
            nullable = true))
      else requiredData
    val vecFn = GraftSourceTable.readFunction(
      fileDataSchema, requiredPart, requiredData, parquetFilters,
      returningBatch = batched)
    val rowFn =
      if (needPos) GraftSourceTable.readFunction(
        fileDataSchema, requiredPart, rowRequired, parquetFilters,
        returningBatch = false)
      else vecFn
    val deleteFn =
      if (scanHasDeletes) Some(GraftSourceTable.readFunction(
        GraftSourceTable.DeleteSchema, new StructType(),
        GraftSourceTable.DeleteSchema))
      else None
    new GraftReaderFactory(vecFn, batched, appendFile = wantFile,
      rowFn = rowFn,
      posOrdinal = if (needPos) Some(requiredData.length) else None,
      partCols = requiredPart.length,
      appendPos = wantPos,
      deleteFn = deleteFn,
      physicalSchema =
        if (needPos) StructType(rowRequired.fields ++ requiredPart.fields)
        else null)
  }

  /** Runtime group filter (row-level ops): table-relative paths to keep. */
  protected var runtimeKeep: Option[Set[String]] = None
  private var plannedCache: Array[InputPartition] = _
  protected def invalidatePlanned(): Unit = plannedCache = null
  /** Hook for row-level operations: the final post-filter file list. */
  protected def onPlanned(files: Seq[String]): Unit = ()

  /** Post-skipping file set, fixed per Scan so the reported partitioning
    * and the planned partitions agree. Bucketed manifests attach each
    * file's bucket id as its partition key (HasPartitionKey), which is
    * what Spark groups on for storage-partitioned joins.
    *
    * A pushed LIMIT truncates to a file prefix once cumulative manifest
    * row counts reach it (partial push — Spark reapplies the exact
    * limit). Skipped for bucketed manifests, whose partition grouping
    * wants the full bucket set, and for any file missing a row count. */
  protected def planned: Array[InputPartition] = {
    if (plannedCache != null) return plannedCache
    val skipped0 = GraftSourceTable.skipByStats(st, filters)
    val skipped = runtimeKeep match {
      case Some(k) => skipped0.filter(k.contains)
      case None    => skipped0
    }
    val limited = limit match {
      // deletes make per-file row counts over-claims — no LIMIT prefixing
      case Some(n) if st.buckets == 0 && st.deletes.isEmpty &&
          skipped.forall(f => st.stats.get(f).exists(_.nonEmpty)) =>
        val rows = skipped.map(f => st.stats(f).values.head.rows)
        val cum = rows.scanLeft(0L)(_ + _).tail
        val keep = cum.indexWhere(_ >= n.toLong) match {
          case -1 => skipped.length
          case i  => i + 1
        }
        skipped.take(keep)
      case _ => skipped
    }
    onPlanned(limited)
    plannedCache = GraftFilePartition.forFiles(dir, limited, requiredPart,
      bucketed = st.buckets > 0, deletes = st.deletes)
    plannedCache
  }

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
      requiredPart, startingVersion.map(_ - 1), maxFilesPerTrigger)
}

/** Offsets are commit-log versions; a microbatch is the files the interval
  * (start, end] added. Append-only contract like readChanges: rewritten
  * files replay their rows. The user-facing `startingVersion` option is
  * INCLUSIVE (Delta semantics) — `initialVersion` here is the exclusive
  * last-processed form. `maxFilesPerTrigger` bounds a batch via admission
  * control: the end offset stops at the last version whose cumulative
  * added-file count fits (always admitting at least one version, so one
  * oversized commit still progresses). */
class GraftMicroBatchStream(dir: String, factory: () => PartitionReaderFactory,
                            requiredPart: StructType, initialVersion: Option[Int],
                            maxFilesPerTrigger: Option[Int] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles}
  private def log = GraftSourceTable.log(dir)
  override def initialOffset(): Offset =
    GraftVersionOffset(initialVersion.getOrElse(0))
  override def latestOffset(): Offset =
    GraftVersionOffset(log.currentVersion.getOrElse(0))
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())
  override def reportLatestOffset(): Offset = latestOffset()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = log.currentVersion.getOrElse(0)
    val s = start.asInstanceOf[GraftVersionOffset].version
    val cap = limit match {
      case m: ReadMaxFiles => m.maxFiles()
      case _               => return GraftVersionOffset(cur)
    }
    if (cur <= s) return GraftVersionOffset(cur)
    // one readRange replay over the pending window, same as planning
    val states = log.readRange(math.max(1, s), cur)
      .map(v => v.version -> v.files.toSet).toMap
    var prev: Set[String] = if (s <= 0) Set.empty else states(s)
    var admitted = s
    var total = 0
    var v = s + 1
    while (v <= cur) {
      val files = states(v)
      val added = (files -- prev).size
      if (admitted > s && total + added > cap) v = cur + 1
      else { total += added; admitted = v; prev = files; v += 1 }
    }
    GraftVersionOffset(admitted)
  }
  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toInt)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].version
    val e = end.asInstanceOf[GraftVersionOffset].version
    if (e <= s) Array.empty
    else {
      val before = if (s <= 0) Set.empty[String] else log.read(s).files.toSet
      val after = log.read(e)
      GraftFilePartition.forFiles(dir, after.files.filterNot(before), requiredPart,
        deletes = after.deletes)
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
  def relPath: String
  def length: Long
  def partitionValues: InternalRow
  /** Merge-on-read delete files covering this data file: (uri, length). */
  def deleteFiles: Seq[(String, Long)]
}
case class GraftFilePartition(path: String, relPath: String, length: Long,
                              partitionValues: InternalRow,
                              deleteFiles: Seq[(String, Long)] = Nil)
    extends GraftInputPartition
/** A bucketed manifest file: its bucket id is the partition key Spark
  * groups on for storage-partitioned joins. */
case class GraftBucketedFilePartition(path: String, relPath: String, length: Long,
                                      partitionValues: InternalRow, bucket: Int,
                                      deleteFiles: Seq[(String, Long)] = Nil)
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
               bucketed: Boolean = false,
               deletes: Map[String, Seq[String]] = Map.empty): Array[InputPartition] = {
    val store = GraftSourceTable.store(dir)
    files.map { f =>
      val uri = GraftSourceTable.fileUri(dir, f)
      val size = store.sizeOf(graft.relations.WarehouseIO.join(dir, f))
      val pv = GraftSourceTable.partitionValues(f, partitionSchema)
      val dels = deletes.getOrElse(f, Nil).map { d =>
        (GraftSourceTable.fileUri(dir, d),
          store.sizeOf(graft.relations.WarehouseIO.join(dir, d)))
      }
      graft.relations.RelationManager.bucketIdOf(f) match {
        case Some(b) if bucketed => GraftBucketedFilePartition(uri, f, size, pv, b, dels)
        case _                   => GraftFilePartition(uri, f, size, pv, dels)
      }
    }.toArray[InputPartition]
  }
}

/** Wraps the shipped decode function. In row mode it unwraps any stray
  * ColumnarBatch the way FileScanRDD does; in batched mode it serves
  * ColumnarBatches directly to the vectorized scan. `appendFile` appends
  * the `_file` metadata column (the file's table-relative path) to every
  * row — row mode only.
  *
  * Merge-on-read: when `posOrdinal` is set, row mode reads through `rowFn`,
  * whose physical rows carry the parquet-generated absolute row index at
  * that ordinal (layout: requiredData…, rowIndex, partitionCols…). A
  * partition with `deleteFiles` builds its dead-position set from them
  * (via `deleteFn`, O(delta) bytes) and filters; `physicalSchema` +
  * `appendPos` drive the projection back to the declared read schema
  * (data…, part…, [_file], [_pos]). Clean partitions in batched scans
  * keep the vectorized fast path untouched. */
class GraftReaderFactory(fn: PartitionedFile => Iterator[InternalRow],
                         batched: Boolean = false,
                         appendFile: Boolean = false,
                         rowFn: PartitionedFile => Iterator[InternalRow] = null,
                         posOrdinal: Option[Int] = None,
                         partCols: Int = 0,
                         appendPos: Boolean = false,
                         deleteFn: Option[PartitionedFile => Iterator[InternalRow]] = None,
                         physicalSchema: StructType = null)
    extends PartitionReaderFactory {

  private def open(partition: InputPartition,
                   f: PartitionedFile => Iterator[InternalRow]): Iterator[Any] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    f(PartitionedFile(p.partitionValues,
      SparkPath.fromUrlString(p.path), 0L, p.length))
  }

  override def supportColumnarReads(partition: InputPartition): Boolean =
    batched && partition.asInstanceOf[GraftInputPartition].deleteFiles.isEmpty

  /** Dead positions of this partition's data file: union of its delete
    * files' entries for it. A tiny read — delete files hold only the
    * touched rows' identities. */
  private def deadPositions(p: GraftInputPartition): java.util.HashSet[Long] = {
    val decode = deleteFn.getOrElse(throw new IllegalStateException(
      s"${p.relPath} carries merge-on-read deletes but this scan was " +
        "planned without a delete decoder — replan the query (the table " +
        "gained deletes after the stream/scan started)"))
    val dead = new java.util.HashSet[Long]()
    val rel = org.apache.spark.unsafe.types.UTF8String.fromString(p.relPath)
    p.deleteFiles.foreach { case (uri, len) =>
      decode(PartitionedFile(InternalRow.empty,
        SparkPath.fromUrlString(uri), 0L, len)).foreach {
        case b: ColumnarBatch => b.rowIterator().asScala.foreach(r =>
          if (r.getUTF8String(0).equals(rel)) dead.add(r.getLong(1)))
        case r: InternalRow =>
          if (r.getUTF8String(0).equals(rel)) dead.add(r.getLong(1))
        case other => throw new IllegalStateException(other.getClass.getName)
      }
    }
    dead
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    val readFn = if (posOrdinal.isDefined) rowFn else fn
    val base: Iterator[InternalRow] = open(partition, readFn).flatMap {
      case b: ColumnarBatch => b.rowIterator().asScala
      case r => Iterator.single(r.asInstanceOf[InternalRow])
    }
    if (p.deleteFiles.nonEmpty && posOrdinal.isEmpty)
      throw new IllegalStateException(
        s"${p.relPath} carries merge-on-read deletes but the scan did not " +
          "request row positions — replan the query")
    val rows: Iterator[InternalRow] = posOrdinal match {
      case None =>
        // pre-MoR fast path: physical row == declared order (data…, part…)
        if (!appendFile) base
        else {
          val fileRow = InternalRow(org.apache.spark.unsafe.types.UTF8String
            .fromString(p.relPath))
          val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
          base.map(r => joined(r, fileRow))
        }
      case Some(idx) =>
        val dead = if (p.deleteFiles.isEmpty) null else deadPositions(p)
        val live =
          if (dead == null || dead.isEmpty) base
          else base.filter(r => !dead.contains(r.getLong(idx)))
        // physical (data…, idx, part…) + appended file → declared
        // (data…, part…, [_file], [_pos])
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        val fileRow = InternalRow(org.apache.spark.unsafe.types.UTF8String
          .fromString(p.relPath))
        val fileOrdinal = physicalSchema.length
        val inputTypes = physicalSchema.fields.map(_.dataType) :+ StringType
        val outRefs: Seq[Int] =
          (0 until idx) ++ ((idx + 1) to (idx + partCols)) ++
            (if (appendFile) Seq(fileOrdinal) else Nil) ++
            (if (appendPos) Seq(idx) else Nil)
        val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(outRefs.map(i =>
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              i, inputTypes(i), nullable = true)))
        live.map(r => proj(joined(r, fileRow)))
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
    val batches = open(partition, fn).map(_.asInstanceOf[ColumnarBatch])
    new PartitionReader[ColumnarBatch] {
      private var current: ColumnarBatch = _
      override def next(): Boolean =
        if (batches.hasNext) { current = batches.next(); true } else false
      override def get(): ColumnarBatch = current
      override def close(): Unit = ()
    }
  }
}
