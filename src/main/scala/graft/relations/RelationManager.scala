package graft.relations

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}
import graft.core.Relation

/** Relation/DDL surface over a parquet warehouse (SURVEY §2.4; reference:
  * manifest.json §macro.dbt.create_table_as / rename_relation /
  * make_backup_relation / drop_relation …).
  *
  * Layout: `<root>/<schema>/<identifier>` is a parquet directory; a table
  * is "in the catalog" iff the directory exists, and is additionally
  * registered as a session temp view for `spark.sql` access.
  *
  * Writes are staged: build into `<identifier>__graft_tmp`, then swap via
  * filesystem rename with a `__graft_backup` fallback — the same
  * intermediate/backup dance as the reference's table materialization
  * (manifest.json §materialization_table_default), which also solves
  * Spark's cannot-overwrite-path-being-read restriction for incremental
  * rewrites. On a real deployment the swap maps to an atomic metastore
  * repoint; on plain parquet we document the weaker guarantee (SURVEY §7.4).
  */
final class RelationManager(val spark: SparkSession, val root: String) {

  def path(rel: Relation): Path = Paths.get(root, rel.schema, rel.identifier)
  private def tmpPath(rel: Relation): Path = Paths.get(root, rel.schema, rel.identifier + "__graft_tmp")
  private def backupPath(rel: Relation): Path = Paths.get(root, rel.schema, rel.identifier + "__graft_backup")

  def exists(rel: Relation): Boolean = Files.exists(path(rel))

  def read(rel: Relation): DataFrame = spark.read.parquet(path(rel).toString)

  /** CTAS with atomic-ish swap; re-registers the session view. */
  def writeTable(df: DataFrame, rel: Relation, partitionBy: Seq[String] = Nil): Unit = {
    val tmp = tmpPath(rel)
    deleteDir(tmp)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(tmp.toString)
    swapInto(rel, tmp)
    register(rel)
  }

  /** Append without rewrite (incremental append strategy). */
  def appendTable(df: DataFrame, rel: Relation): Unit = {
    df.write.mode(SaveMode.Append).parquet(path(rel).toString)
    register(rel)
  }

  /** Dynamic partition overwrite (incremental insert_overwrite strategy):
    * only partitions present in `df` are replaced — native Spark.
    * (reference: manifest.json §default__get_insert_overwrite_merge_sql) */
  def overwritePartitions(df: DataFrame, rel: Relation, partitionBy: Seq[String]): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      df.write.mode(SaveMode.Overwrite)
        .partitionBy(partitionBy: _*)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path(rel).toString)
    } finally prev.foreach(spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
    register(rel)
  }

  private def swapInto(rel: Relation, tmp: Path): Unit = {
    val target = path(rel)
    val backup = backupPath(rel)
    Files.createDirectories(target.getParent)
    deleteDir(backup)
    val hadTarget = Files.exists(target)
    if (hadTarget) Files.move(target, backup, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: Throwable =>
        if (hadTarget) Files.move(backup, target, StandardCopyOption.ATOMIC_MOVE)
        throw e
    }
    deleteDir(backup)
  }

  /** Bucketed CTAS through the session catalog (bucket metadata lives in
    * the catalog, so parquet-path writes can't carry it). Two tables
    * bucketed on the same key with the same bucket count join WITHOUT a
    * shuffle — the co-located-join layout for repeatedly-joined 100 TB
    * facts (verified by BucketingSpec: no Exchange in the join plan). */
  def writeBucketedTable(df: DataFrame, rel: Relation,
                         buckets: Int, bucketCols: Seq[String]): Unit = {
    val tableName = rel.viewName
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    df.write
      .format("parquet")
      .option("path", path(rel).toString + "__bucketed")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(tableName)
  }

  def readBucketedTable(rel: Relation): DataFrame = spark.table(rel.viewName)

  /** Register as `<schema>__<identifier>` temp view for spark.sql models. */
  def register(rel: Relation): Unit =
    read(rel).createOrReplaceTempView(rel.viewName)

  def registerView(rel: Relation, df: DataFrame): Unit =
    df.createOrReplaceTempView(rel.viewName)

  /** Delete one partition directory (`col=value`) under a partitioned
    * table — the delete half of delete+insert-per-batch microbatch
    * semantics (a reprocessed batch whose source rows vanished must still
    * clear its partition; dynamic overwrite of an empty frame deletes
    * nothing). */
  def dropPartitionDir(rel: Relation, partDir: String): Unit = {
    deleteDir(path(rel).resolve(partDir))
    if (exists(rel)) register(rel)
  }

  def drop(rel: Relation): Unit = {
    deleteDir(path(rel))
    spark.catalog.dropTempView(rel.viewName)
  }

  def rename(from: Relation, to: Relation): Unit = {
    Files.createDirectories(path(to).getParent)
    Files.move(path(from), path(to), StandardCopyOption.ATOMIC_MOVE)
    spark.catalog.dropTempView(from.viewName)
    register(to)
  }

  def truncate(rel: Relation): Unit = {
    val schema = read(rel).schema
    writeTable(spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), rel)
  }

  def columnsIn(rel: Relation): StructType = read(rel).schema

  def listRelations(schema: String): Seq[String] = {
    val dir = Paths.get(root, schema)
    if (!Files.exists(dir)) Nil
    else Files.list(dir).iterator().asScala
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString)
      .filterNot(n => n.endsWith("__graft_tmp") || n.endsWith("__graft_backup"))
      .toSeq.sorted
  }

  def lastModified(rel: Relation): Option[java.time.Instant] =
    if (!exists(rel)) None
    else Some(java.time.Instant.ofEpochMilli(
      Files.list(path(rel)).iterator().asScala
        .map(p => Files.getLastModifiedTime(p).toMillis).maxOption.getOrElse(0L)))

  /** persist_docs / grants (reference: manifest.json §persist_docs,
    * §apply_grants): plain parquet has no catalog comments or ACLs, so
    * relation-level docs and grant intents persist as a metadata sidecar —
    * the shape a catalog-backed deployment maps onto TBLPROPERTIES/GRANT. */
  def persistMeta(rel: Relation, docs: Map[String, String],
                  grants: Map[String, Seq[String]] = Map.empty): Unit = {
    def q(s: String) = graft.core.Json.quote(s)
    val d = docs.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}: ${q(v)}" }
    val g = grants.toSeq.sortBy(_._1).map { case (k, vs) =>
      s"${q(k)}: [${vs.map(q).mkString(",")}]" }
    Files.createDirectories(path(rel))
    Files.writeString(path(rel).resolve("_graft_meta.json"),
      s"""{"docs":{${d.mkString(",")}},"grants":{${g.mkString(",")}}}""")
  }

  def readMeta(rel: Relation): Option[String] = {
    val p = path(rel).resolve("_graft_meta.json")
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  /** Microbatch checkpoint: the max processed batch end, persisted beside
    * the data (underscore-prefixed files are invisible to parquet scans).
    * Survives sessions, so a fresh CLI run resumes where the last ended
    * (reference: checkpoint math microbatch.py:41-79). */
  def writeCheckpoint(rel: Relation, at: java.time.Instant): Unit = {
    Files.createDirectories(path(rel))
    Files.writeString(path(rel).resolve("_graft_checkpoint"), at.toString)
  }

  def readCheckpoint(rel: Relation): Option[java.time.Instant] = {
    val p = path(rel).resolve("_graft_checkpoint")
    if (Files.exists(p)) Some(java.time.Instant.parse(Files.readString(p).trim)) else None
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
    writeTable(selectAs(read(rel), schema), rel)

  private def deleteDir(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }

  private implicit class IterAsScala[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}
