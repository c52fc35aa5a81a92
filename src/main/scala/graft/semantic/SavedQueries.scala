package graft.semantic

import org.apache.spark.sql.{Column, DataFrame}
import graft.core.Relation
import graft.relations.RelationManager

/** saved_query + export (reference: SavedQuery / Export / ExportConfig,
  * core/dbt/artifacts/resources/v1/saved_query.py:34-96): a named,
  * reusable semantic-layer query (metrics + grain + where) whose exports
  * materialize the result as warehouse tables or views. The reference
  * only parses these and hands execution to the external MetricFlow
  * service; here the metric compiler produces the frame directly and the
  * relation manager materializes each export — one groupBy shuffle per
  * saved query regardless of how many exports read it.
  */
object SavedQueries {

  /** One export target (reference: ExportConfig — export_as table|view,
    * schema, alias). */
  final case class Export(
      name: String,
      exportAs: String = "table",
      schema: Option[String] = None)

  final case class SavedQuery(
      name: String,
      model: Metrics.SemanticModel,
      metrics: Seq[Metrics.Metric],
      grain: Seq[String],
      where: Option[Column] = None,
      exports: Seq[Export] = Nil)

  /** The saved query's frame (query_params → metric compiler). */
  def compile(sq: SavedQuery): DataFrame = {
    val df = Metrics.query(sq.model, sq.metrics, sq.grain)
    sq.where.map(df.filter).getOrElse(df)
  }

  /** Materialize every export; returns export name → relation. */
  def run(rm: RelationManager, defaultSchema: String,
          sq: SavedQuery): Map[String, Relation] = {
    val df = compile(sq)
    sq.exports.map { e =>
      val rel = Relation("graft", e.schema.getOrElse(defaultSchema), e.name,
        if (e.exportAs == "view") "view" else "table")
      e.exportAs match {
        case "view" => rm.registerView(rel, df)
        case _      => rm.writeTable(df, rel)
      }
      e.name -> rel
    }.toMap
  }
}
