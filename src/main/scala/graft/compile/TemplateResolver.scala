package graft.compile

import graft.core._

/** Deliberately tiny template resolver (SURVEY §7.1 step 2) — the engine's
  * replacement for dbt's Jinja surface (reference: core/dbt/context/base.py,
  * core/dbt/context/providers.py): `{{ ref('x') }}`, `{{ ref('pkg','x') }}`,
  * `{{ source('s','t') }}`, `{{ this }}`, `{{ var('name'[, default]) }}`,
  * `{{ env_var('NAME'[, default]) }}`, `{{ config(key=value, ...) }}`
  * (parse-time extraction, removed from rendered SQL), and
  * `{% if is_incremental() %}...{% endif %}` blocks.
  *
  * NOT general Jinja — by design (SURVEY §4: "full Jinja is the thing to
  * avoid, not emulate"). Anything beyond this surface belongs in native
  * Scala models.
  */
object TemplateResolver {

  private val RefRe = raw"""\{\{\s*ref\s*\(\s*'([^']+)'\s*(?:,\s*'([^']+)'\s*)?\)\s*\}\}""".r
  private val SourceRe = raw"""\{\{\s*source\s*\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}""".r
  private val ThisRe = raw"""\{\{\s*this\s*\}\}""".r
  private val VarRe = raw"""\{\{\s*var\s*\(\s*'([^']+)'\s*(?:,\s*'?([^')]*)'?\s*)?\)\s*\}\}""".r
  private val EnvVarRe = raw"""\{\{\s*env_var\s*\(\s*'([^']+)'\s*(?:,\s*'([^']*)'\s*)?\)\s*\}\}""".r
  private val ConfigRe = raw"""\{\{\s*config\s*\(([^)]*)\)\s*\}\}""".r
  private val IncrRe = raw"""(?s)\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)\{%\s*endif\s*%\}""".r

  /** Parse-time extraction of refs/sources/config without rendering
    * (reference: the static parser, core/dbt/parser/models.py:28,303-386). */
  def extractRefs(sql: String): Seq[String] =
    RefRe.findAllMatchIn(sql).map(m => Option(m.group(2)).getOrElse(m.group(1))).toSeq.distinct

  def extractSources(sql: String): Seq[(String, String)] =
    SourceRe.findAllMatchIn(sql).map(m => (m.group(1), m.group(2))).toSeq.distinct

  /** Extract `{{ config(materialized='table', unique_key='id', ...) }}`
    * key=value pairs (string/number/bool literals only). */
  def extractConfig(sql: String): Map[String, String] =
    ConfigRe.findFirstMatchIn(sql).map { m =>
      m.group(1).split(",").iterator
        .map(_.trim).filter(_.nonEmpty)
        .flatMap { kv =>
          kv.split("=", 2) match {
            case Array(k, v) => Some(k.trim -> v.trim.stripPrefix("'").stripSuffix("'"))
            case _           => None
          }
        }.toMap
    }.getOrElse(Map.empty)

  final case class Context(
      resolveRef: String => String,              // model name -> relation SQL name
      resolveSource: (String, String) => String, // (source, table) -> relation SQL name
      thisRelation: String,
      vars: Map[String, String] = Map.empty,
      env: Map[String, String] = sys.env,
      isIncremental: Boolean = false)

  /** Render a model's SQL against a resolution context. Unknown vars with
    * no default throw, mirroring dbt's compilation error. */
  def render(sql: String, ctx: Context): String = {
    var out = sql
    out = ConfigRe.replaceAllIn(out, "")
    out = IncrRe.replaceAllIn(out, m =>
      if (ctx.isIncremental) java.util.regex.Matcher.quoteReplacement(m.group(1)) else "")
    out = RefRe.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(
        ctx.resolveRef(Option(m.group(2)).getOrElse(m.group(1)))))
    out = SourceRe.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(ctx.resolveSource(m.group(1), m.group(2))))
    out = ThisRe.replaceAllIn(out, java.util.regex.Matcher.quoteReplacement(ctx.thisRelation))
    out = VarRe.replaceAllIn(out, m => {
      val name = m.group(1)
      val dflt = Option(m.group(2)).map(_.trim).filter(_.nonEmpty)
      java.util.regex.Matcher.quoteReplacement(
        ctx.vars.get(name).orElse(dflt).getOrElse(
          throw new IllegalArgumentException(s"undefined var '$name'")))
    })
    out = EnvVarRe.replaceAllIn(out, m => {
      val name = m.group(1)
      val dflt = Option(m.group(2))
      java.util.regex.Matcher.quoteReplacement(
        ctx.env.get(name).orElse(dflt).getOrElse(
          throw new IllegalArgumentException(s"undefined env_var '$name'")))
    })
    out.trim
  }

  /** Build a Node from raw model SQL: static extraction of refs, sources,
    * and inline config (reference: parser/models.py ModelParser). */
  def parseModel(pkg: String, name: String, sql: String): Node = {
    val cfg = extractConfig(sql)
    val base = NodeConfig(
      materialized = cfg.getOrElse("materialized", "view"),
      incrementalStrategy = cfg.get("incremental_strategy"),
      uniqueKey = cfg.get("unique_key").toSeq.flatMap(_.split("\\s*\\|\\s*")),
      onSchemaChange = cfg.get("on_schema_change").map(OnSchemaChange.parse)
        .getOrElse(OnSchemaChange.Ignore),
      eventTime = cfg.get("event_time"),
      batchSize = cfg.get("batch_size"),
      tags = cfg.get("tags").map(_.split("\\s*\\|\\s*").toSet).getOrElse(Set.empty),
      alias = cfg.get("alias"),
      schema = cfg.get("schema"),
      severity = cfg.getOrElse("severity", "error"),
      meta = cfg) // full config map for materialization-specific keys
    Node(
      nodeType = NodeType.Model,
      packageName = pkg,
      name = name,
      code = Some(SqlCode(sql)),
      config = base,
      refs = extractRefs(sql),
      sources = extractSources(sql),
      fqn = Seq(pkg, name),
      checksum = java.security.MessageDigest.getInstance("MD5")
        .digest(sql.getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }
}
