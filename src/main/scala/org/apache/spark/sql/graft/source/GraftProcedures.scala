package org.apache.spark.sql.graft.source

import java.util.{Iterator => JIterator}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.Relation
import graft.relations.RelationManager

/** Stored MAINTENANCE PROCEDURES for a graft catalog (r17) — the
  * `CALL` surface (SPARK-44167 procedure SPIP; the Iceberg
  * `CALL cat.system.*` convention, public docs/source):
  *
  * {{{
  *   CALL wh.system.vacuum(table => 'main.postings', keep_versions => 2)
  *   CALL wh.system.optimize(table => 'main.events', cluster_by => 'ts', zorder => false)
  *   CALL wh.system.history(table => 'main.orders', num_versions => 20)
  * }}}
  *
  * Each procedure binds its arguments by name or position (defaults
  * evaluated by the analyzer), runs the corresponding
  * [[RelationManager]] lifecycle operation against the catalog's
  * warehouse root, and returns its result as a [[LocalScan]] — Spark
  * turns the rows into the CALL statement's result relation, so
  * `history` is directly queryable and `vacuum`/`optimize` report what
  * they did. This is what lets a SCHEDULED operation node reclaim
  * storage inside the DAG (`examples/retrieval_gc`'s gc_compact ends
  * with a vacuum CALL) — table-format lifecycle commands become plain
  * SQL statements any Spark job can issue. */
private[source] object GraftProcedures {

  val Names: Seq[String] = Seq("vacuum", "optimize", "history")

  def load(name: String, root: String): Option[UnboundProcedure] = name match {
    case "vacuum"   => Some(new VacuumProcedure(root))
    case "optimize" => Some(new OptimizeProcedure(root))
    case "history"  => Some(new HistoryProcedure(root))
    case _          => None
  }

  /** Parse the `table` argument — `schema.identifier` within this
    * catalog (the Iceberg convention's table-name string form). */
  private[source] def relOf(table: String): Relation = table.split("\\.") match {
    case Array(schema, id) => Relation("graft", schema, id)
    case _ => throw new IllegalArgumentException(
      s"procedure table argument must be '<schema>.<table>': $table")
  }

  private[source] def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** One-result procedure scaffold: bind is identity (arguments are
    * declared, the analyzer coerces/fills defaults), `call` runs the
    * side effect and returns a single in-memory result scan. */
  private[source] abstract class MaintenanceProcedure(root: String)
      extends UnboundProcedure with BoundProcedure {
    protected def rm: RelationManager =
      new RelationManager(SparkSession.active, root)
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false // side-effecting
    protected def result(schema: StructType, out: Seq[InternalRow]): JIterator[Scan] = {
      val outArr = out.toArray
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = outArr
        override def readSchema(): StructType = schema
      }).iterator()
    }
  }

  private[source] class VacuumProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "vacuum"
    override def description(): String =
      "delete data files unreferenced by the kept table versions and " +
        "truncate older version manifests (the commit-log lifecycle command)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("keep_versions", IntegerType).defaultValue("1").build())
    override def call(input: InternalRow): JIterator[Scan] = {
      val rel = relOf(input.getUTF8String(0).toString)
      val keep = math.max(1, input.getInt(1))
      val m = rm
      m.vacuum(rel, keepVersions = keep)
      val st = m.currentState(rel).getOrElse(throw new IllegalArgumentException(
        s"no such table: ${rel.schema}.${rel.identifier}"))
      result(
        StructType(Seq(StructField("table", StringType, nullable = false),
          StructField("kept_versions", IntegerType, nullable = false),
          StructField("live_files", IntegerType, nullable = false))),
        Seq(new GenericInternalRow(Array[Any](
          utf8(s"${rel.schema}.${rel.identifier}"), keep, st.files.size))))
    }
  }

  private[source] class OptimizeProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "optimize"
    override def description(): String =
      "bin-pack small files; optionally range-cluster or Z-ORDER by key"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      // '|'-separated cluster columns; empty = bin-pack only
      ProcedureParameter.in("cluster_by", StringType).defaultValue("''").build(),
      ProcedureParameter.in("zorder", BooleanType).defaultValue("false").build())
    override def call(input: InternalRow): JIterator[Scan] = {
      val rel = relOf(input.getUTF8String(0).toString)
      val cluster = input.getUTF8String(1).toString
        .split("\\|").map(_.trim).filter(_.nonEmpty).toSeq
      val z = input.getBoolean(2)
      val m = rm
      val before = m.currentState(rel).map(_.files.size).getOrElse(0)
      m.optimize(rel, clusterBy = cluster, zorder = z)
      val after = m.currentState(rel).map(_.files.size).getOrElse(0)
      result(
        StructType(Seq(StructField("table", StringType, nullable = false),
          StructField("files_before", IntegerType, nullable = false),
          StructField("files_after", IntegerType, nullable = false),
          StructField("layout", StringType, nullable = false))),
        Seq(new GenericInternalRow(Array[Any](
          utf8(s"${rel.schema}.${rel.identifier}"), before, after,
          utf8(if (RelationManager.zorderApplies(cluster, z)) "z-ordered"
          else if (cluster.nonEmpty) "clustered" else "bin-packed")))))
    }
  }

  private[source] class HistoryProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "history"
    override def description(): String =
      "commit history of a table over its log (DESCRIBE HISTORY analog)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("num_versions", IntegerType).defaultValue("20").build())
    override def call(input: InternalRow): JIterator[Scan] = {
      val rel = relOf(input.getUTF8String(0).toString)
      val entries = rm.history(rel, limit = math.max(1, input.getInt(1)))
      result(
        StructType(Seq(
          StructField("version", IntegerType, nullable = false),
          StructField("committed_at", StringType, nullable = true),
          StructField("files", IntegerType, nullable = false),
          StructField("added", IntegerType, nullable = false),
          StructField("removed", IntegerType, nullable = false),
          StructField("change_feed", BooleanType, nullable = false))),
        entries.map(e => new GenericInternalRow(Array[Any](
          e.version,
          e.committedAt.map(t => utf8(t.toString)).orNull,
          e.files, e.added, e.removed, e.storedChanges))))
    }
  }
}
