package graft.runner

import org.apache.spark.sql.DataFrame
import graft.core._
import graft.relations.RelationManager

/** The reference's command/task surface beyond `run`/`build`
  * (SURVEY §2.8; reference: core/dbt/cli/main.py): show, compile, list,
  * retry, clone, plus the manifest artifact.
  */
object Commands {

  /** dbt show — preview N rows of a node or inline SQL
    * (reference: core/dbt/task/show.py:20-146; limit wrapper
    * manifest.json §default__get_limit_subquery_sql). */
  def show(runner: Runner, node: Node, limit: Int = 5): DataFrame =
    runner.buildDf(node).limit(limit)

  def showInline(runner: Runner, spark: org.apache.spark.sql.SparkSession,
                 sql: String, limit: Int = 5): DataFrame =
    spark.sql(sql).limit(limit)

  /** dbt compile — the rendered SQL for a node (reference: cli/main.py:309). */
  def compile(runner: Runner, node: Node): String = runner.compileSql(node)

  /** dbt list — selected node ids in lexical order (reference: cli/main.py:485). */
  def list(manifest: Manifest, select: Seq[String] = Nil, exclude: Seq[String] = Nil,
           previousState: Option[Manifest] = None,
           previousResults: Map[String, String] = Map.empty): Seq[String] =
    Selector.select(manifest, select, exclude, previousState, previousResults).toSeq.sorted

  /** dbt retry — rerun only failed/skipped/errored nodes of a previous run
    * (reference: core/dbt/task/retry.py). */
  def retry(runner: Runner, previous: Seq[RunResult], withTestEdges: Boolean = false): Seq[RunResult] = {
    // replay the EXACT previous node set by unique_id — selecting by bare
    // name would re-run unrelated same-named nodes (reference: task/retry.py)
    val again = previous.filter(r => Set("fail", "error", "skipped")(r.status))
      .map(r => s"unique_id:${r.uniqueId}")
    if (again.isEmpty) Seq.empty else runner.run(select = again, withTestEdges = withTestEdges)
  }

  /** dbt clone — materialize a node as a pointer/copy of its relation in
    * another (state) warehouse (reference: core/dbt/task/clone.py:103-156;
    * manifest.json §can_clone_table / §create_or_replace_clone). On parquet
    * the zero-copy clone is a view over the state relation; `deep=true`
    * copies the files (what CREATE TABLE CLONE does on non-CoW stores). */
  def clone(stateRm: RelationManager, targetRm: RelationManager,
            rel: Relation, deep: Boolean = false): Unit = {
    if (deep) targetRm.writeTable(stateRm.read(rel), rel)
    else targetRm.registerView(rel, stateRm.read(rel))
  }

  /** manifest.json artifact in the REFERENCE's v12 shape (schema
    * schemas/dbt/manifest/v12.json; core/dbt/artifacts/schemas/manifest/
    * v12/manifest.py:100-119): every top-level key the schema requires is
    * present, executable nodes carry the full v12-required field set
    * (database/schema/path/fqn/alias/checksum-object/config/depends_on),
    * and sources serve the SourceDefinition required set — so
    * state:modified diffing AND external dbt-ecosystem tooling can load
    * it. Documented divergences (ArtifactSchemaSpec asserts this exact
    * list): the semantic-layer maps (metrics / saved_queries /
    * semantic_models / unit_tests) carry graft's own minimal entries, and
    * macros/docs/exposures/groups are empty (collapsed machinery). */
  def writeManifest(manifest: Manifest, path: String,
                    defaultSchema: String = "main",
                    projectName: String = "graft"): Unit = {
    def q(s: String) = Json.quote(s)
    def sarr(xs: Seq[String]) = xs.map(q).mkString("[", ",", "]")
    def fqnOf(n: graft.core.Node): Seq[String] =
      if (n.fqn.nonEmpty) n.fqn else Seq(n.packageName, n.name)
    def common(n: graft.core.Node): String = {
      val schema = n.config.schema.getOrElse(defaultSchema)
      val db = n.config.database.getOrElse("graft")
      val path = n.path.getOrElse(s"${n.name}.sql")
      s""""database":${q(db)},"schema":${q(schema)},"name":${q(n.name)},""" +
        s""""resource_type":${q(n.nodeType.name)},"package_name":${q(n.packageName)},""" +
        s""""path":${q(path)},"original_file_path":${q(path)},""" +
        s""""unique_id":${q(n.uniqueId)},"fqn":${sarr(fqnOf(n))}"""
    }
    def execCommon(n: graft.core.Node): String =
      common(n) + s""","alias":${q(n.config.alias.getOrElse(n.name))},""" +
        s""""checksum":{"name":"md5","checksum":${q(n.checksum)}}"""
    val byKind = manifest.nodes.values.toSeq.groupBy(_.nodeType)
    def kinds(ts: graft.core.NodeType*): Seq[graft.core.Node] =
      ts.flatMap(byKind.getOrElse(_, Nil)).sortBy(_.uniqueId)
    import graft.core.NodeType._
    val execNodes = kinds(Model, Seed, Snapshot, Test, Analysis, Operation, SqlOperation)
      .map { n =>
        val cfg =
          s"""{"enabled":${n.config.enabled},"materialized":${q(n.config.materialized)},""" +
            s""""tags":${sarr(n.config.tags.toSeq.sorted)},""" +
            s""""meta":{${n.config.meta.toSeq.sorted.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString(",")}}}"""
        // v12 Seed.depends_on is macro-only (seeds cannot ref) — the
        // node-bearing DependsOn shape fails its anyOf branch
        val deps =
          if (n.nodeType == graft.core.NodeType.Seed) s"""{"macros":[]}"""
          else s"""{"macros":[],"nodes":${sarr(n.dependsOn)}}"""
        s"""${q(n.uniqueId)}: {${execCommon(n)},"config":$cfg,""" +
          s""""tags":${sarr(n.config.tags.toSeq.sorted)},""" +
          s""""depends_on":$deps}"""
      }
    val sources = kinds(Source).map { n =>
      val srcName = n.sources.headOption.map(_._1).getOrElse(n.packageName)
      s"""${q(n.uniqueId)}: {${common(n)},"source_name":${q(srcName)},""" +
        s""""source_description":"","loader":"","identifier":${q(n.name)}}"""
    }
    // graft-shaped semantic-layer entries (documented divergence)
    def minimal(ts: graft.core.NodeType*): String = kinds(ts: _*).map(n =>
      s"""${q(n.uniqueId)}: {"name":${q(n.name)},"package_name":${q(n.packageName)},""" +
        s""""unique_id":${q(n.uniqueId)},"resource_type":${q(n.nodeType.name)}}""").mkString(",")
    val parentMap = manifest.parentMap.toSeq.sortBy(_._1).map { case (id, ps) =>
      s"${q(id)}: ${sarr(ps)}"
    }
    val childMap = manifest.childMap.toSeq.sortBy(_._1).map { case (id, cs) =>
      s"${q(id)}: ${sarr(cs)}"
    }
    val meta =
      s"""{"dbt_schema_version":"https://schemas.getdbt.com/dbt/manifest/v12.json",""" +
        s""""generated_at":${q(java.time.Instant.now().toString)},""" +
        s""""project_name":${q(projectName)},"adapter_type":"graft-spark"}"""
    val json =
      s"""{"metadata":$meta,
         |"nodes":{${execNodes.mkString(",")}},
         |"sources":{${sources.mkString(",")}},
         |"macros":{},"docs":{},"exposures":{${minimal(Exposure)}},
         |"metrics":{${minimal(Metric)}},
         |"groups":{},"selectors":{},"disabled":{},
         |"parent_map":{${parentMap.mkString(",")}},
         |"child_map":{${childMap.mkString(",")}},
         |"group_map":{},
         |"saved_queries":{${minimal(SavedQuery)}},
         |"semantic_models":{${minimal(SemanticModel)}},
         |"unit_tests":{${minimal(Unit)}}}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  /** catalog.json artifact (reference: core/dbt/task/docs/generate.py:49-216)
    * — per-relation column schemas and row counts for docs tooling. */
  def writeCatalog(rm: RelationManager, manifest: Manifest, runner: Runner, path: String): Unit = {
    def q(s: String) = Json.quote(s)
    val entries = manifest.nodes.values.toSeq
      .filter(n => NodeType.refable(n.nodeType) && !n.isEphemeral)
      .sortBy(_.uniqueId)
      .flatMap { n =>
        val rel = runner.relationFor(n)
        if (!rm.exists(rel)) None
        else {
          val df = rm.read(rel)
          val cols = df.schema.fields.zipWithIndex.map { case (f, i) =>
            s"""${q(f.name)}: {"type":${q(f.dataType.simpleString)},"index":$i,"name":${q(f.name)},"comment":null}"""
          }
          // stats in the reference's StatsItem shape (catalog v1)
          val stats =
            s""""row_count": {"id":"row_count","label":"Row Count",""" +
              s""""value":${df.count()},"include":true,"description":null},""" +
              s""""has_stats": {"id":"has_stats","label":"Has Stats?",""" +
              s""""value":true,"include":false,"description":null}"""
          Some(s"""${q(n.uniqueId)}: {"metadata":{"type":"table","name":${q(rel.identifier)},""" +
            s""""schema":${q(rel.schema)},"database":"graft","comment":null,"owner":null},""" +
            s""""columns":{${cols.mkString(",")}},"stats":{$stats}}""")
        }
      }
    // reference catalog v1 shape (schemas/dbt/catalog/v1.json): metadata +
    // nodes + sources are all required top-level keys
    val json =
      s"""{"metadata":{"dbt_schema_version":"https://schemas.getdbt.com/dbt/catalog/v1.json",""" +
        s""""generated_at":${q(java.time.Instant.now().toString)}},""" +
        s""""nodes":{${entries.mkString(",")}},"sources":{},"errors":null}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  /** docs index: dependency-free lineage page over the manifest — the
    * target of `docs serve` (reference: docs site, task/docs/). */
  def writeDocsIndex(manifest: Manifest, path: String): Unit = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val rows = manifest.nodes.toSeq.sortBy(_._1).map { case (id, n) =>
      val parents = manifest.parentMap.getOrElse(id, Nil)
      s"<tr><td>${esc(id)}</td><td>${esc(n.config.materialized)}</td>" +
        s"<td>${esc(n.config.tags.toSeq.sorted.mkString(", "))}</td>" +
        s"<td>${parents.map(esc).mkString("<br>")}</td></tr>"
    }
    val html =
      s"""<!doctype html><html><head><meta charset="utf-8"><title>graft docs</title>
         |<style>body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}
         |td,th{border:1px solid #ccc;padding:4px 8px;text-align:left;vertical-align:top}</style>
         |</head><body><h1>graft project</h1>
         |<p>${manifest.nodes.size} nodes ·
         |<a href="manifest.json">manifest.json</a> ·
         |<a href="catalog.json">catalog.json</a></p>
         |<table><tr><th>node</th><th>materialized</th><th>tags</th><th>depends on</th></tr>
         |${rows.mkString("\n")}
         |</table></body></html>""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), html)
  }

  /** docs serve: a minimal HTTP file server over the target dir
    * (reference: cli/main.py:279 docs serve). JDK built-in server — no
    * dependency; port 0 = ephemeral. Caller stops the returned server. */
  def serveDocs(targetDir: String, port: Int = 0): com.sun.net.httpserver.HttpServer = {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val root = java.nio.file.Paths.get(targetDir).toAbsolutePath.normalize()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val raw = ex.getRequestURI.getPath
        val name = if (raw == "/" || raw.isEmpty) "index.html" else raw.stripPrefix("/")
        val p = root.resolve(name).normalize()
        val body =
          if (p.startsWith(root) && java.nio.file.Files.isRegularFile(p))
            Some(java.nio.file.Files.readAllBytes(p))
          else None
        body match {
          case Some(bytes) =>
            ex.getResponseHeaders.add("Content-Type",
              if (name.endsWith(".json")) "application/json" else "text/html")
            ex.sendResponseHeaders(200, bytes.length.toLong)
            ex.getResponseBody.write(bytes)
          case None =>
            val msg = "not found".getBytes("UTF-8")
            ex.sendResponseHeaders(404, msg.length.toLong)
            ex.getResponseBody.write(msg)
        }
        ex.close()
      }
    })
    server.start()
    server
  }

  /** Load a previous manifest artifact's checksums for state:modified
    * selection (reference: selector_methods.py StateSelectorMethod).
    * Parses the JSON properly — a writer change can no longer silently
    * break state selection (r1/r2 regex scraping replaced). */
  def loadManifestChecksums(path: String): Map[String, String] = {
    val doc = Json.obj(Json.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path))))
    Json.obj(doc("nodes")).map { case (id, n) =>
      id -> checksumOf(Json.obj(n))
    }
  }

  /** v12 writes checksum as a FileHash object; pre-v12 graft artifacts
    * carried a bare string — read both so --state against an old target
    * dir keeps working. */
  private def checksumOf(node: Map[String, Any]): String =
    node("checksum") match {
      case s: String => s
      case o         => Json.str(Json.obj(o)("checksum"))
    }

  /** Reconstruct a previous manifest as stub nodes (id + checksum) — the
    * shape `state:` selection compares against (`--state` / `--defer`). */
  def loadStateManifest(path: String): Manifest = {
    val doc = Json.obj(Json.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path))))
    Manifest(Json.obj(doc("nodes")).map { case (id, v) =>
      val n = Json.obj(v)
      val typeName = Json.str(n("resource_type"))
      val nodeType = NodeType.all.find(_.name == typeName).getOrElse(NodeType.Model)
      id -> Node(nodeType, Json.str(n("package_name")), Json.str(n("name")),
        checksum = checksumOf(n))
    })
  }

  /** One source's freshness verdict, carrying what the v3 artifact needs. */
  final case class FreshnessStatus(uniqueId: String, status: String,
                                   maxLoadedAt: java.time.Instant,
                                   snapshottedAt: java.time.Instant,
                                   ageSeconds: Double,
                                   warnAfterSec: Long, errorAfterSec: Long)

  /** sources.json in the REFERENCE's v3 shape (schemas/dbt/sources/
    * v3.json, core/dbt/task/freshness.py): SourceFreshnessOutput rows
    * with loaded-at/snapshotted-at instants, age, and the thresholds as
    * FreshnessThreshold criteria. `source_status:` selection and retry
    * keep reading unique_id/status. */
  def writeSourcesJson(statuses: Seq[FreshnessStatus], path: String): Unit = {
    def q(s: String) = Json.quote(s)
    def time(sec: Long): String =
      if (sec <= 0) "null"
      else if (sec % 86400 == 0) s"""{"count":${sec / 86400},"period":"day"}"""
      else if (sec % 3600 == 0) s"""{"count":${sec / 3600},"period":"hour"}"""
      // v3's FreshnessThreshold only speaks whole minutes/hours/days; a
      // threshold that isn't a whole number of minutes rounds to the
      // NEAREST minute (ties up), not truncation — 90 s must read as 2
      // minutes, not 1 (ADVICE r7: truncation understated thresholds by
      // up to 49%)
      else s"""{"count":${math.max(1L, Math.round(sec / 60.0))},"period":"minute"}"""
    val rows = statuses.map { st =>
      s"""{"unique_id":${q(st.uniqueId)},"max_loaded_at":${q(st.maxLoadedAt.toString)},""" +
        s""""snapshotted_at":${q(st.snapshottedAt.toString)},""" +
        s""""max_loaded_at_time_ago_in_s":${st.ageSeconds},"status":${q(st.status)},""" +
        s""""criteria":{"warn_after":${time(st.warnAfterSec)},"error_after":${time(st.errorAfterSec)},"filter":null},""" +
        s""""adapter_response":{},"timing":[],"thread_id":"main","execution_time":0.0}"""
    }
    val json =
      s"""{"metadata":{"dbt_schema_version":"https://schemas.getdbt.com/dbt/sources/v3.json",""" +
        s""""generated_at":${q(java.time.Instant.now().toString)}},""" +
        s""""results":[${rows.mkString(",")}],"elapsed_time":0.0}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  /** Load a previous run's statuses for retry / `result:` selection
    * (reference: core/dbt/task/retry.py reads run_results.json). */
  def loadRunResults(path: String): Map[String, String] = {
    val doc = Json.obj(Json.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path))))
    Json.arr(doc("results")).map(Json.obj).map { r =>
      Json.str(r("unique_id")) -> Json.str(r("status"))
    }.toMap
  }
}
