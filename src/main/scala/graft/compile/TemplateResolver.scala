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
  // `{{ ref_changes('name') }}` (r18): a ref's rows ADDED since the
  // consuming operation last completed — the CDC-subscription primitive
  // that bounds scheduled store maintenance to O(new feed rows) instead
  // of O(feed). Only operations resolve it (the Runner registers a
  // version-windowed change-feed view per run); models reject it.
  private val RefChangesRe =
    raw"""\{\{\s*ref_changes\s*\(\s*'([^']+)'\s*\)\s*\}\}""".r
  // ref('model', v=2) — versioned ref (reference: versioned ref resolution,
  // core/dbt/context/providers.py:1110 ref with version kwarg). Encoded as
  // `name##version` through the name-based resolution path.
  private val RefVerRe = raw"""\{\{\s*ref\s*\(\s*'([^']+)'\s*,\s*v\s*=\s*(\d+)\s*\)\s*\}\}""".r
  private val SourceRe = raw"""\{\{\s*source\s*\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}""".r
  private val ThisRe = raw"""\{\{\s*this\s*\}\}""".r
  private val VarRe = raw"""\{\{\s*var\s*\(\s*'([^']+)'\s*(?:,\s*'?([^')]*)'?\s*)?\)\s*\}\}""".r
  private val EnvVarRe = raw"""\{\{\s*env_var\s*\(\s*'([^']+)'\s*(?:,\s*'([^']*)'\s*)?\)\s*\}\}""".r
  private val ConfigStartRe = raw"""\{\{\s*config\s*\(""".r
  private val IncrRe = raw"""(?s)\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)\{%\s*endif\s*%\}""".r

  /** Locate the config(...) block with a balanced-paren, quote-aware scan —
    * a plain regex breaks on nested parens / commas inside quoted values
    * (e.g. pre_hook="insert into audit values ('x', 1)"). Returns
    * (startOffset, endOffset-after-`}}`, argString) if present. */
  private def scanConfig(sql: String): Option[(Int, Int, String)] =
    ConfigStartRe.findFirstMatchIn(sql).flatMap { m =>
      var i = m.end; var depth = 1; var quote: Char = 0
      val args = new StringBuilder
      while (i < sql.length && depth > 0) {
        val c = sql.charAt(i)
        if (quote != 0) { if (c == quote) quote = 0; args += c }
        else c match {
          case '\'' | '"' => quote = c; args += c
          case '('        => depth += 1; args += c
          case ')'        => depth -= 1; if (depth > 0) args += c
          case _          => args += c
        }
        i += 1
      }
      if (depth != 0) None
      else {
        // consume trailing whitespace + `}}`
        var j = i
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (j + 1 < sql.length && sql.charAt(j) == '}' && sql.charAt(j + 1) == '}')
          Some((m.start, j + 2, args.toString))
        else None
      }
    }

  /** Split on a separator at top level only (outside quotes and parens). */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val parts = collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { if (c == quote) quote = 0; cur += c }
      else c match {
        case '\'' | '"'         => quote = c; cur += c
        case '('                => depth += 1; cur += c
        case ')'                => depth -= 1; cur += c
        case `sep` if depth == 0 => parts += cur.toString; cur.clear()
        case _                  => cur += c
      }
    }
    parts += cur.toString
    parts.toSeq
  }

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && ((t.head == '\'' && t.last == '\'') || (t.head == '"' && t.last == '"')))
      t.substring(1, t.length - 1)
    else t
  }

  /** Parse-time extraction of refs/sources/config without rendering
    * (reference: the static parser, core/dbt/parser/models.py:28,303-386). */
  def extractRefs(sql: String): Seq[String] =
    (RefRe.findAllMatchIn(sql).map(m => Option(m.group(2)).getOrElse(m.group(1))) ++
      RefVerRe.findAllMatchIn(sql).map(m => s"${m.group(1)}##${m.group(2)}") ++
      RefChangesRe.findAllMatchIn(sql).map(_.group(1))).toSeq.distinct

  /** The refs a snippet consumes as CHANGE FEEDS (ref_changes) — the
    * Runner windows and registers these per operation run. */
  def extractChangeRefs(sql: String): Seq[String] =
    RefChangesRe.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct

  def extractSources(sql: String): Seq[(String, String)] =
    SourceRe.findAllMatchIn(sql).map(m => (m.group(1), m.group(2))).toSeq.distinct

  /** Extract `{{ config(materialized='table', unique_key='id', ...) }}`
    * key=value pairs. Quote- and paren-aware: values may contain commas,
    * nested parens, and both quote styles (VERDICT r1 "what's wrong" #8).
    * Multiple config() calls are legal and merge, later blocks winning on
    * key collision — dbt's multi-config merge semantics. */
  def extractConfig(sql: String): Map[String, String] = {
    def one(args: String): Map[String, String] =
      splitTopLevel(args, ',').iterator
        .map(_.trim).filter(_.nonEmpty)
        .flatMap { kv =>
          splitTopLevel(kv, '=') match {
            case k +: rest if rest.nonEmpty => Some(k.trim -> stripQuotes(rest.mkString("=")))
            case _                          => None
          }
        }.toMap
    var rest = sql
    var acc = Map.empty[String, String]
    var found = scanConfig(rest)
    while (found.isDefined) {
      val (_, e, args) = found.get
      acc = acc ++ one(args)
      rest = rest.substring(e)
      found = scanConfig(rest)
    }
    acc
  }

  final case class Context(
      resolveRef: String => String,              // model name -> relation SQL name
      resolveSource: (String, String) => String, // (source, table) -> relation SQL name
      thisRelation: String,
      vars: Map[String, String] = Map.empty,
      env: Map[String, String] = sys.env,
      isIncremental: Boolean = false,
      // ref_changes('x') -> the windowed change-feed view the Runner
      // registered for this operation run; defaults to rejection (models
      // and tests have no change-feed cursor to window against)
      resolveRefChanges: String => String = n =>
        throw new IllegalArgumentException(
          s"ref_changes('$n') is only valid inside a scheduled operation"))

  /** Render a model's SQL against a resolution context. Unknown vars with
    * no default throw, mirroring dbt's compilation error. */
  def render(sql: String, ctx: Context): String = {
    var out = sql
    // strip EVERY config() block — a model may carry several (they merge)
    var cfgBlock = scanConfig(out)
    while (cfgBlock.isDefined) {
      val (s, e, _) = cfgBlock.get
      out = out.substring(0, s) + out.substring(e)
      cfgBlock = scanConfig(out)
    }
    out = IncrRe.replaceAllIn(out, m =>
      if (ctx.isIncremental) java.util.regex.Matcher.quoteReplacement(m.group(1)) else "")
    out = RefChangesRe.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(ctx.resolveRefChanges(m.group(1))))
    out = RefVerRe.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(
        ctx.resolveRef(s"${m.group(1)}##${m.group(2)}")))
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
      lookback = cfg.get("lookback").map(_.toInt).getOrElse(1),
      begin = cfg.get("begin").map(java.time.Instant.parse),
      partitionBy = cfg.get("partition_by").toSeq.flatMap(_.split("\\s*\\|\\s*")).filter(_.nonEmpty),
      // hooks are declarable inline; `;;` separates multiple statements
      // (reference: pre-hook/post-hook core/dbt/artifacts/resources/v1/config.py:86-94)
      preHooks = cfg.get("pre_hook").toSeq.flatMap(_.split("\\s*;;\\s*")).filter(_.nonEmpty),
      postHooks = cfg.get("post_hook").toSeq.flatMap(_.split("\\s*;;\\s*")).filter(_.nonEmpty),
      tags = cfg.get("tags").map(_.split("\\s*\\|\\s*").toSet).getOrElse(Set.empty),
      group = cfg.get("group"),
      access = cfg.getOrElse("access", "protected"),
      version = cfg.get("version").map(_.toInt),
      versionedOf = cfg.get("versioned_of"),
      alias = cfg.get("alias"),
      schema = cfg.get("schema"),
      severity = cfg.getOrElse("severity", "error"),
      where = cfg.get("where"),
      limit = cfg.get("limit").map(_.toInt),
      warnIf = cfg.getOrElse("warn_if", "!= 0"),
      errorIf = cfg.getOrElse("error_if", "!= 0"),
      failCalc = cfg.getOrElse("fail_calc", "count(*)"),
      storeFailures = cfg.get("store_failures").contains("true"),
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
