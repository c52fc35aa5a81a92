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

  /** manifest.json artifact (reference: schema v12
    * core/dbt/artifacts/schemas/manifest/v12/manifest.py:100-119) — nodes,
    * configs, and the parent map; enough for state:modified diffing and
    * external lineage tools. */
  def writeManifest(manifest: Manifest, path: String): Unit = {
    def q(s: String) = Json.quote(s)
    val nodes = manifest.nodes.toSeq.sortBy(_._1).map { case (id, n) =>
      s"""${q(id)}: {"name":${q(n.name)},"resource_type":${q(n.nodeType.name)},""" +
        s""""package_name":${q(n.packageName)},"checksum":${q(n.checksum)},""" +
        s""""materialized":${q(n.config.materialized)},"tags":[${n.config.tags.toSeq.sorted.map(q).mkString(",")}],""" +
        s""""depends_on":[${n.dependsOn.map(q).mkString(",")}]}"""
    }
    val parentMap = manifest.parentMap.toSeq.sortBy(_._1).map { case (id, ps) =>
      s"${q(id)}: [${ps.map(q).mkString(",")}]"
    }
    val json =
      s"""{"metadata":{"dbt_schema_version":"graft-manifest-v1","generated_at":${q(java.time.Instant.now().toString)}},
         |"nodes":{${nodes.mkString(",")}},
         |"parent_map":{${parentMap.mkString(",")}}}""".stripMargin
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
            s"${q(f.name)}: {\"type\":${q(f.dataType.simpleString)},\"index\":$i}"
          }
          Some(s"""${q(n.uniqueId)}: {"metadata":{"name":${q(rel.identifier)},"schema":${q(rel.schema)}},""" +
            s""""columns":{${cols.mkString(",")}},"stats":{"row_count":${df.count()}}}""")
        }
      }
    val json = s"""{"metadata":{"dbt_schema_version":"graft-catalog-v1"},"nodes":{${entries.mkString(",")}}}"""
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
      id -> Json.str(Json.obj(n)("checksum"))
    }
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
        checksum = Json.str(n("checksum")))
    })
  }

  /** sources.json: per-source freshness statuses, same results shape as
    * run_results so one loader serves both (reference: freshness artifact,
    * core/dbt/task/freshness.py). */
  def writeSourcesJson(statuses: Seq[(String, String)], path: String): Unit = {
    def q(s: String) = Json.quote(s)
    val rows = statuses.map { case (id, st) =>
      s"""{"unique_id":${q(id)},"status":${q(st)}}""" }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      s"""{"results":[${rows.mkString(",")}]}""")
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
