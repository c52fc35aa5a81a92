package graft.runner

import java.time.Instant
import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core._
import graft.compile.TemplateResolver
import graft.materializations.{Materializations, Snapshot}
import graft.quality.GenericTests
import graft.relations.RelationManager

/** Node execution result (reference: run_results.json schema,
  * core/dbt/artifacts/schemas/run/). */
final case class RunResult(
    uniqueId: String,
    status: String, // success | fail | warn | error | skipped
    startedAt: Instant,
    completedAt: Instant,
    message: String = "") {
  def executionSeconds: Double =
    (completedAt.toEpochMilli - startedAt.toEpochMilli) / 1000.0
}

/** The DAG executor (reference: core/dbt/task/runnable.py:408-520
  * execute_nodes + core/dbt/task/run.py:195-335 ModelRunner).
  *
  * Steps 1-5 of the reference lifecycle (SURVEY §3.1) are driver-side:
  * parse → manifest → link → select → schedule. Step 6's execution
  * boundary (`adapter.execute`) becomes a Spark action: the
  * driver→executor boundary replaces the client→warehouse boundary and
  * Catalyst replaces the warehouse planner.
  *
  * `threads` maps dbt's --threads: concurrent nodes become concurrent
  * Spark jobs sharing the session (FAIR scheduling lets independent
  * subtrees overlap shuffle/IO).
  */
final class Runner(
    spark: SparkSession,
    rm: RelationManager,
    manifest: Manifest,
    vars: Map[String, String] = Map.empty,
    defaultSchema: String = "main",
    database: String = "graft",
    threads: Int = 4,
    fullRefresh: Boolean = false,
    // --defer --state: unselected/unbuilt upstream refs resolve to a
    // production (state) warehouse (reference: RuntimeRefResolver
    // .create_relation, core/dbt/context/providers.py:626-660)
    defer: Option[RelationManager] = None,
    // --sample 'last N days': event-time refs get a window filter injected
    // (reference: core/dbt/event_time/sample_window.py:15,
    // providers.py:245-296)
    sampleWindow: Option[(Instant, Instant)] = None,
    // --state: previous manifest for state:modified/new selection; previous
    // run statuses for result:<status> and retry
    previousState: Option[Manifest] = None,
    previousResults: Map[String, String] = Map.empty,
    // --fail-fast: abort the whole run on the first node failure — nodes
    // not yet started are marked skipped (reference:
    // core/dbt/cli/params.py:237 fail_fast, task/runnable.py _cancel logic)
    failFast: Boolean = false,
    // --empty: schema-only dry run — every ref()/source() input is limited
    // to zero rows, so models build their full schemas (contracts still
    // assert) without moving data (reference: core/dbt/cli/params.py:163,
    // providers.py resolve_limit)
    emptyRun: Boolean = false) {

  /** generate_schema_name / generate_alias_name naming policy
    * (reference: manifest.json §generate_schema_name, §generate_alias_name). */
  def relationFor(n: Node): Relation = Relation(
    database = n.config.database.getOrElse(database),
    schema = n.config.schema.getOrElse(defaultSchema),
    identifier = n.config.alias.getOrElse(n.name),
    relType = if (n.config.materialized == "view") "view" else "table")

  private def sqlNameFor(n: Node): String = relationFor(n).viewName

  /** Resolve a non-ephemeral dependency to a queryable SQL name: the local
    * warehouse if built, else the defer (state) warehouse. Registers the
    * deferred relation as a session view on first use. */
  private def resolveRelationName(dep: Node): String = {
    val rel = relationFor(dep)
    val name = rel.viewName
    if (!spark.catalog.tableExists(name)) {
      if (rm.exists(rel)) rm.register(rel) // fresh session over an existing warehouse
      else defer.filter(_.exists(rel)).foreach { st =>
        st.read(rel).createOrReplaceTempView(name)
      }
    }
    name
  }

  /** UTC timestamp literal for rendered window predicates. NOT
    * java.sql.Timestamp.toString — that renders in the JVM-DEFAULT
    * timezone while Spark parses the literal in the SESSION timezone
    * (UTC here), which would silently shift every injected window on a
    * non-UTC JVM: a row near a batch boundary gets excluded from its own
    * batch's input window AND from the next batch's output filter —
    * permanently dropped (r15 review). */
  private def tsLiteral(i: Instant): String = {
    // microsecond precision — the same grain as the native path's
    // lit(java.sql.Timestamp), so the SQL and native dep windows can
    // never disagree on a sub-millisecond boundary
    val s = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC).format(i)
    s"timestamp'$s'"
  }

  /** Rendered event-time window filters (sample + microbatch batch) for
    * a dependency that declares event_time — shared by the table-ref and
    * ephemeral-CTE paths so the two can never diverge on which windows
    * apply (r15 review: the first ephemeral wrap skipped the sample
    * window). */
  private def windowWrap(inner: String, dep: Node,
                         batchWindow: Option[(Instant, Instant)]): String =
    dep.config.eventTime match {
      case Some(et) =>
        (sampleWindow.toSeq ++ batchWindow.toSeq).foldLeft(inner) { (n, w) =>
          s"(select * from $n where $et >= ${tsLiteral(w._1)}" +
            s" and $et < ${tsLiteral(w._2)})"
        }
      case None => inner
    }

  /** Wrap a resolved relation in the sample and/or microbatch event-time
    * window filters when the dependency declares an event_time column.
    * The batch window is the reference's microbatch ref-filter injection
    * (core/dbt/context/providers.py:245-296): inside a microbatch model,
    * every ref to an event-time-carrying input reads ONLY the current
    * batch's rows — the predicate reaches the scan, so per-batch work is
    * O(batch), not O(history). {{ this }} is deliberately NOT filtered
    * (reference semantics: a self-referencing microbatch model reads its
    * full accumulated state). */
  private def applySample(dep: Node, name: String,
                          batchWindow: Option[(Instant, Instant)] = None): String =
    emptyWrap(windowWrap(name, dep, batchWindow))

  /** Thread-local --empty override: the microbatch bucketed-store
    * bootstrap builds its schema-only v0 commit with every input limited
    * to zero rows (r17 — removes the eager-native-body hazard: the body
    * runs, but over empty inputs, so even an in-body materialization
    * costs nothing). Thread-local, not a field: nodes run concurrently
    * on the task pool, and the bootstrap build happens synchronously on
    * its node's thread. */
  private val forceEmptyInputs = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }
  private def withEmptyInputs[A](body: => A): A = {
    forceEmptyInputs.set(true)
    try body finally forceEmptyInputs.set(false)
  }
  private def inputsEmpty: Boolean = emptyRun || forceEmptyInputs.get()

  /** --empty: inputs become zero-row subqueries (schemas intact). */
  private def emptyWrap(name: String): String =
    if (inputsEmpty) s"(select * from $name limit 0)" else name

  /** Compile a SQL node: render refs/sources and recursively inline
    * ephemeral deps as CTEs (reference: Compiler._recursively_prepend_ctes
    * core/dbt/compilation.py:493-587, inject_ctes_into_sql :761-829). */
  def compileSql(node: Node, isIncremental: Boolean = false,
                 batchWindow: Option[(Instant, Instant)] = None): String = {
    val cteNames = collection.mutable.LinkedHashMap.empty[String, String]
    def resolveRef(name: String): String = {
      val dep = manifest.byName(name).getOrElse(
        throw new NoSuchElementException(s"unknown ref '$name'"))
      // access enforcement: a private model is referenceable only inside
      // its own group (reference: ModelNode access checks,
      // core/dbt/parser/manifest.py process_refs access validation)
      if (dep.config.access == "private" && dep.config.group != node.config.group)
        throw new IllegalAccessError(
          s"Node ${node.uniqueId} cannot ref private model ${dep.name} " +
            s"(group ${dep.config.group.getOrElse("<none>")})")
      if (dep.isEphemeral) {
        val cte = s"__graft_cte__${dep.name}"
        if (!cteNames.contains(cte)) {
          val depSql = dep.code match {
            case Some(SqlCode(sql)) => renderBody(sql, dep, isIncremental = false)
            case _ => throw new IllegalStateException(s"ephemeral ${dep.name} must be SQL")
          }
          cteNames += cte -> depSql
        }
        // an ephemeral dep declaring event_time gets the SAME window
        // wrap as a table ref (sample AND batch) — the inlined CTE is
        // this model's input exactly like a relation
        windowWrap(cte, dep, batchWindow)
      } else applySample(dep, resolveRelationName(dep), batchWindow)
    }
    def renderBody(sql: String, n: Node, isIncremental: Boolean): String =
      TemplateResolver.render(sql, TemplateResolver.Context(
        resolveRef = resolveRef,
        // sources registered as <source>_<table> views
        resolveSource = (s, t) => emptyWrap(s"${s}_$t"),
        // {{ this }} must also self-register in a fresh session over an
        // existing warehouse (the incremental re-run path)
        thisRelation = resolveRelationName(n),
        vars = vars,
        isIncremental = isIncremental))
    val body = node.code match {
      case Some(SqlCode(sql)) => renderBody(sql, node, isIncremental)
      case _ => throw new IllegalStateException(s"${node.name} is not a SQL node")
    }
    if (cteNames.isEmpty) body
    else {
      val ctes = cteNames.map { case (n, s) => s"$n as (\n$s\n)" }.mkString(",\n")
      // If the body already opens with its own WITH clause, splice the
      // ephemeral CTEs into it instead of emitting a second WITH keyword
      // (reference: inject_ctes_into_sql core/dbt/compilation.py:761-829).
      val LeadingWith = """(?is)^\s*with\b(.*)""".r
      body match {
        case LeadingWith(rest) => s"with $ctes,$rest"
        case _                 => s"with $ctes\n$body"
      }
    }
  }

  /** Build (but don't execute) a node's DataFrame. `batchWindow` is the
    * current microbatch's [start, end): dependencies that declare an
    * event_time column are filtered to it — the reference's microbatch
    * ref-filter injection (core/dbt/context/providers.py:245-296), which
    * is what keeps a batch's work O(batch) instead of O(history): the
    * predicate reaches the dep's scan. */
  def buildDf(node: Node, isIncremental: Boolean = false,
              batchWindow: Option[(Instant, Instant)] = None): DataFrame = node.code match {
    case Some(SqlCode(_)) => spark.sql(compileSql(node, isIncremental, batchWindow))
    case Some(NativeCode(fn)) =>
      def windowFilter(df: DataFrame, et: Option[String]): DataFrame = {
        import org.apache.spark.sql.functions.{col, lit}
        (sampleWindow.toSeq ++ batchWindow.toSeq).foldLeft(df) { (d, w) =>
          et match {
            case Some(c) => d.filter(col(c) >= lit(java.sql.Timestamp.from(w._1)) &&
              col(c) < lit(java.sql.Timestamp.from(w._2)))
            case None => d
          }
        }
      }
      // test-BLOCKING edges (a tested upstream's tests gate this node's
      // run) are scheduling-only: a test node has no readable relation,
      // so it must not become a deps entry (r15 s3 — surfaced by the
      // first native model depending on a TESTED model; SQL models were
      // never exposed because compileSql only references refable deps)
      // --empty / the bootstrap pre-pass applies to NATIVE inputs too
      // (r17): dep frames are limited to zero rows, so the body builds
      // its full schema without moving data — the DataFrame form of the
      // SQL path's zero-row subquery wrap
      def maybeEmpty(df: DataFrame): DataFrame =
        if (inputsEmpty) df.limit(0) else df
      // scheduling-only edges never become deps entries: a test node has
      // no readable relation (r15 s3), and an OPERATION node (r17) is a
      // DML step, not a frame — both order the run, neither feeds data
      val deps = node.dependsOn.flatMap(manifest.get)
        .filter(d => d.nodeType != NodeType.Test &&
          d.nodeType != NodeType.Operation)
        .map { d =>
        val df =
          if (d.isEphemeral)
            // the window applies to the inlined frame too (and recurses,
            // so an ephemeral chain's own event-time deps stay pruned)
            windowFilter(buildDf(d, batchWindow = batchWindow), d.config.eventTime)
          else {
            // a source dep lives as the session view registerSources
            // created (`<source>_<table>`), not in the warehouse — the
            // same name compileSql's resolveSource hands SQL models
            val base = d.nodeType match {
              case NodeType.Source =>
                val (s0, t0) = d.sources.headOption.getOrElse(
                  throw new IllegalStateException(
                    s"source node ${d.uniqueId} missing its (source, table)"))
                spark.table(s"${s0}_$t0")
              case _ => spark.table(resolveRelationName(d))
            }
            windowFilter(base, d.config.eventTime)
          }
        d.name -> maybeEmpty(df)
      }.toMap
      // native models get `this` — the model's own existing relation
      // (the reference's dbt.this for Python models, providers.py:1566):
      // the incremental/microbatch self-reference an ingest-ledger model
      // probes its accumulated state through. Resolved FRESH per call
      // (rm.read, not a pinned temp view) so batch k+1 of one microbatch
      // run sees batch k's commit; deliberately NEVER batch-filtered
      // (reference: {{ this }} is exempt from the microbatch ref filter).
      // Absent on the initial build — the fn branches on
      // deps.contains("this"), mirroring is_incremental().
      val relSelf = relationFor(node)
      val withThis =
        if (node.config.materialized == "incremental" && !deps.contains("this")
            && rm.exists(relSelf))
          deps + ("this" -> rm.read(relSelf))
        else deps
      fn(spark, withThis)
    case None => throw new IllegalStateException(s"${node.name} has no code")
  }

  /** Warehouse relations a node's compiled SQL references by view name:
    * its refable deps, looking THROUGH ephemerals (whose SQL is inlined as
    * CTEs referencing their own deps). Sources are excluded — they are
    * registered at session start, not stored in the warehouse. */
  private def persistentDeps(n: Node): Seq[Relation] = {
    val seen = collection.mutable.LinkedHashSet.empty[Relation]
    def go(x: Node): Unit = x.dependsOn.flatMap(manifest.get).foreach {
      case d if d.isEphemeral                  => go(d)
      case d if NodeType.refable(d.nodeType)   => seen += relationFor(d)
      case _                                   => ()
    }
    go(n)
    seen.toSeq
  }

  /** Table write shared by the table and materialized_view paths.
    * Declarable bucketing: config(buckets=N, bucket_by='k') routes rows
    * to bucket files in the commit-log manifest, so repeatedly-joined
    * facts get a shuffle-free storage-partitioned join (BucketingSpec
    * asserts no Exchange) WITHOUT trading away time travel or file-level
    * MERGE. */
  private def writeTableFor(node: Node, rel: Relation): Unit =
    node.config.meta.get("buckets").map(_.toInt) match {
      case Some(n) =>
        val cols = node.config.meta.getOrElse("bucket_by",
          throw new IllegalArgumentException(
            s"${node.name}: buckets=$n needs bucket_by"))
          .split("\\s*\\|\\s*").toSeq
        rm.writeTable(buildDf(node), rel, node.config.partitionBy,
          statsCols = (cols ++ node.config.partitionBy).distinct,
          bucketBy = cols, buckets = n)
      case None =>
        Materializations.table(rm, rel, buildDf(node), node.config.partitionBy)
    }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** A materialized view's refresh fingerprint: canonical JSON of
    * {sql, cfg, inputs}. `sql` is the compiled-SELECT hash (captures body,
    * var, and dep-rename changes; native-code bodies are opaque — their
    * node checksum stands in). `cfg` covers the storage-shaping config.
    * `inputs` walks the transitive dependency closure: a table-shaped dep
    * contributes its commit-log version (its own inputs are captured BY
    * that version), a view/ephemeral dep contributes its code checksum and
    * recurses, a source contributes its file size+mtime stamp. Equal
    * fingerprint ⇒ recompute would produce the identical result. */
  private def mvFingerprint(node: Node): String = {
    val inputs = collection.mutable.TreeMap.empty[String, String]
    val seen = collection.mutable.Set.empty[String]
    def stamp(p: String): String = graft.relations.WarehouseIO.stamp(p)
    def go(x: Node): Unit = x.dependsOn.flatMap(manifest.get).foreach { d =>
      if (seen.add(d.uniqueId)) d.nodeType match {
        case NodeType.Source =>
          inputs += s"source:${d.name}" -> d.path.map(stamp).getOrElse("?")
        case t if NodeType.refable(t) || t == NodeType.Model =>
          if (d.isEphemeral || d.config.materialized == "view") {
            inputs += s"code:${d.name}" -> md5Hex(d.checksum); go(d)
          } else {
            val r = relationFor(d)
            inputs += s"rel:${r.render}" -> rm.currentState(r)
              .map(v => s"v${v.version}")
              .orElse(rm.lastModified(r).map(_.toString))
              .getOrElse("absent")
          }
        case _ => () // tests/declarative nodes don't feed the MV's data
      }
    }
    go(node)
    val sqlHash = node.code match {
      case Some(SqlCode(_)) => md5Hex(compileSql(node))
      case _                => "native:" + md5Hex(node.checksum)
    }
    val cfg = Seq(
      "partition_by=" + node.config.partitionBy.mkString(","),
      "buckets=" + node.config.meta.getOrElse("buckets", ""),
      "bucket_by=" + node.config.meta.getOrElse("bucket_by", "")).mkString(";")
    val ins = inputs.map { case (k, v) =>
      s"${Json.quote(k)}:${Json.quote(v)}" }.mkString(",")
    s"""{"sql":${Json.quote(sqlHash)},"cfg":${Json.quote(md5Hex(cfg))},"inputs":{$ins}}"""
  }

  /** Render a standalone SQL snippet (hook) in a node's context —
    * ref/source/this resolve exactly as in the node body (reference:
    * pre_hooks/post_hooks core/dbt/context/providers.py:1482-1487,
    * on-run-start/end core/dbt/hooks.py). {{ this }} resolves to the
    * node's DML-ABLE name when its relation is a committed table (r17):
    * the reference's canonical post-hook pattern is row-level DML on
    * self (`delete from {{ this }} where …`), which a session temp view
    * cannot accept. Refs stay read-shaped (sample-window wrapped). */
  def renderSnippet(node: Node, sql: String): String =
    TemplateResolver.render(sql, TemplateResolver.Context(
      resolveRef = name => applySample(
        manifest.byName(name).getOrElse(throw new NoSuchElementException(s"unknown ref '$name'")),
        resolveRelationName(manifest.byName(name).get)),
      resolveSource = (s, t) => s"${s}_$t",
      thisRelation = {
        val rel = relationFor(node)
        if (rm.currentState(rel).isDefined)
          s"${rm.catalogName}.`${rel.schema}`.`${rel.identifier}`"
        else resolveRelationName(node)
      },
      vars = vars))

  /** Render a project-level operation snippet: refs/sources/vars resolve,
    * no {{ this }} (operations have no target relation) — the engine's
    * run-operation surface (reference: core/dbt/task/run_operation.py).
    * Refs resolve to DML-ABLE names (r17 — the same resolution as
    * scheduled operation nodes), so a maintenance operation invoked
    * manually (`run-operation gc_compact`) can DELETE/INSERT/MERGE the
    * same stores the scheduled form does; reads through the V2 name are
    * equivalent AND see connector commits a pinned temp view would miss. */
  def renderOperation(sql: String): String =
    TemplateResolver.render(sql, TemplateResolver.Context(
      resolveRef = dmlNameFor,
      resolveSource = (s, t) => s"${s}_$t",
      thisRelation = "",
      // the warehouse's V2 catalog name as a built-in var (r17): what a
      // maintenance statement needs to CALL the catalog's stored
      // procedures ({{ var('graft_catalog') }}.system.vacuum(...))
      vars = vars + ("graft_catalog" -> rm.catalogName),
      // a MANUALLY-invoked operation (run-operation / hooks) has no
      // change cursor to window against, so ref_changes degrades to the
      // whole feed — over-processing a window the scheduled form already
      // folded is a no-op under the witness law, and the manual run does
      // NOT advance the scheduled cursor
      resolveRefChanges = dmlNameFor))

  /** A ref target's DML-ABLE name: commit-log tables resolve through the
    * V2 catalog — the name `DELETE FROM` / `INSERT INTO` / `MERGE INTO`
    * accept, with row-level semantics, bucket-layout restaging, and time
    * travel riding the same commit protocol as engine writes. Views and
    * not-yet-committed relations fall back to the session temp view
    * (readable, not DML-able — a DML statement against one fails in
    * analysis, loudly). Used by SCHEDULED operations (r17), whose whole
    * point is store maintenance through the SQL DML surface. */
  private def dmlNameFor(name: String): String = {
    val dep = manifest.byName(name).getOrElse(
      throw new NoSuchElementException(s"unknown ref '$name'"))
    val rel = relationFor(dep)
    if (rm.currentState(rel).isDefined)
      s"${rm.catalogName}.`${rel.schema}`.`${rel.identifier}`"
    else resolveRelationName(dep)
  }

  /** Execute a SCHEDULED operation node (r17): `;;`-separated statements
    * render with refs resolved to DML-able (catalog-qualified) names and
    * run strictly in order — a GC operation can append its compensating
    * rows (e.g. negative term-stats) BEFORE the delete that would erase
    * the evidence, making the whole operation idempotently re-runnable
    * against the stores' own state. Returns (statements run, rows).
    *
    * CRASH-EXACT RESUME (r18 — ADVICE r17, VERDICT task 4): witness
    * ordering makes COMPLETE re-runs idempotent, but a crash BETWEEN
    * statements used to leave an un-healable window — e.g. the negative
    * term-stats append committed, the doc_lens witness delete not yet
    * run, so the next build re-inserts the negatives (double-negated df,
    * permanent staleness). Two mechanisms close it:
    *
    *  1. A JOURNAL (`<warehouse>/_graft_ops/<node>.json`) records the
    *     run's fingerprint — rendered statements + a content hash of the
    *     PURE-INPUT refs (those never named as a DML target) + the DML
    *     targets' manifest versions at run start — and the count of
    *     completed statements. A build that finds a journal resumes at
    *     the recorded statement iff statements and input content match;
    *     a mismatch over a partial run FAILS LOUD, because completing
    *     old statements against new inputs would decouple the
    *     compensation pairing in either direction. Recovery runs at RUN
    *     START ([[run]] — resumeOnly), before any node (a pre-op
    *     freshness test, a consumer model) reads the mid-operation
    *     stores, and since no model has rerun yet the persisted input
    *     tables still hold exactly the crashed run's content — the
    *     resume completes the run it belongs to, whatever the new
    *     build's vars; the loud path is reachable only through
    *     statement drift (the operation file or its rendered vars
    *     edited over a partial run) or manual input-table mutation.
    *  2. Each statement runs under a per-statement replay-guard txn
    *     (`graft-op:<node>:<fp> → statement index`, GraftOpTxn) that the
    *     connector commits ATOMICALLY with the statement's own mutation —
    *     so the crash window between a statement's commit and its journal
    *     record is exact: the resumed statement finds its watermark in
    *     the target table's own manifest and skips. Fresh runs get a
    *     fresh fingerprint (target versions moved), so lookback
    *     re-ingests still self-heal through the witness law. */
  private def runOperationNode(node: Node, resumeOnly: Boolean = false): (Int, Long) = {
    import org.apache.spark.sql.functions.{bit_xor, coalesce, col, count, lit, xxhash64}
    val raw = node.code match {
      case Some(SqlCode(s)) => s
      case _ => throw new IllegalStateException(
        s"operation ${node.name} must be a SQL file")
    }
    val priorRaw = rm.readOpJournal(node.name)
    // run-start crash recovery probe: nothing to resume, nothing to pay
    // (no input scan, no manifest reads)
    if (resumeOnly && priorRaw.isEmpty) return (0, 0L)
    val prior = priorRaw
      .map(s => graft.core.Json.obj(graft.core.Json.parse(s)))
    // ref_changes('x') windows (r18, VERDICT r17 #4): each change-fed ref
    // gets a (fromVersion, toVersion] manifest-version window — from the
    // node's cursor sidecar on a fresh run (advanced only at completion),
    // from the JOURNAL on a resume (so a resumed run replays byte-
    // identical change content regardless of what committed since). The
    // registered view reads only the files ADDED inside the window, so a
    // no-new-feed-rows build renders every statement against an empty
    // feed: GC work is O(new deletions), not O(feed).
    val changeRefs = TemplateResolver.extractChangeRefs(raw)
    val cursors: Map[String, Long] = rm.readOpJournal(s"${node.name}.cursors")
      .map(s => graft.core.Json.obj(graft.core.Json.parse(s))
        .map { case (k, v) => k -> v.asInstanceOf[Long] })
      .getOrElse(Map.empty)
    val windows: Map[String, (Int, Int)] = prior.flatMap(_.get("changes")) match {
      case Some(c) => graft.core.Json.obj(c).map { case (k, v) =>
        val a = graft.core.Json.arr(v)
        k -> ((a(0).asInstanceOf[Long].toInt, a(1).asInstanceOf[Long].toInt))
      }
      case None => changeRefs.map { n =>
        val dep = manifest.byName(n).getOrElse(throw new NoSuchElementException(
          s"operation ${node.name}: ref_changes names unknown ref '$n'"))
        val to = rm.currentState(relationFor(dep)).map(_.version).getOrElse(0)
        // a cursor AHEAD of the feed's version counter means the feed
        // was regenerated (--full-refresh / clean rebuild): replay the
        // whole feed from 0 — the witness law absorbs the replay —
        // instead of failing on a truncated version
        val cur = cursors.getOrElse(n, 0L).toInt
        n -> ((if (cur > to) 0 else cur, to))
      }.toMap
    }
    val changeViews: Map[String, String] = windows.map { case (n, (from, to)) =>
      val dep = manifest.byName(n).get
      val view = s"__graft_changes_${node.name}_$n"
      rm.readChanges(relationFor(dep), from, to).createOrReplaceTempView(view)
      n -> view
    }
    val rendered = Runner.splitStatements(raw).iterator.map(_.trim).filter(_.nonEmpty)
      .map(stmt => TemplateResolver.render(stmt, TemplateResolver.Context(
        resolveRef = dmlNameFor,
        resolveSource = (s, t) => s"${s}_$t",
        thisRelation = "",
        vars = vars + ("graft_catalog" -> rm.catalogName),
        resolveRefChanges = n => changeViews.getOrElse(n,
          throw new NoSuchElementException(s"unwindowed ref_changes('$n')")))))
      .map(_.trim).filter(_.nonEmpty).toSeq // config-only fragment → empty
    val refs = node.dependsOn.flatMap(manifest.get)
      .filter(d => NodeType.refable(d.nodeType) && !d.isEphemeral)
    // classify refs: a ref whose DML-able name follows a DML keyword in
    // any statement is a TARGET (mutated); the rest are pure INPUTS
    val dmlHead = java.util.regex.Pattern.compile(
      """(?is)\b(?:INSERT\s+INTO|INSERT\s+OVERWRITE|DELETE\s+FROM|MERGE\s+INTO|UPDATE|TRUNCATE\s+TABLE)\s+([`\w.]+)""")
    val targetsInSql: Set[String] = rendered.flatMap { s =>
      val m = dmlHead.matcher(s)
      val b = Seq.newBuilder[String]
      while (m.find()) b += m.group(1)
      b.result()
    }.toSet
    val (targets, inputs) =
      refs.partition(d => targetsInSql.contains(dmlNameFor(d.name)))
    def sha(parts: String*): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      parts.foreach(p => md.update(p.getBytes("UTF-8")))
      md.digest().map("%02x".format(_)).mkString
    }
    val stmtsHash = sha(rendered.mkString("\n;;\n"))
    // order-independent content hash of each pure input. A change-fed
    // ref hashes its WINDOWED view — O(new feed rows), which is the
    // whole point of ref_changes; a plain input ref hashes the full
    // table (CDC feeds are O(deletions)-small by design). bit_xor, not
    // sum: xor is order-independent like sum but cannot overflow under
    // ANSI arithmetic
    val inputHash = sha(inputs.sortBy(_.name).map { d =>
      val df = spark.table(changeViews.getOrElse(d.name, dmlNameFor(d.name)))
      val r = df.agg(
        coalesce(bit_xor(xxhash64(df.columns.map(col).toSeq: _*)), lit(0L)),
        count(lit(1))).collect()(0)
      s"${d.name}=${r.getLong(0)}/${r.getLong(1)}"
    }.mkString(","))
    val (fp, start) = prior match {
      case Some(j)
        if graft.core.Json.str(j("stmts_hash")) == stmtsHash &&
           graft.core.Json.str(j("input_hash")) == inputHash =>
        (graft.core.Json.str(j("fingerprint")),
          j("completed").asInstanceOf[Long].toInt)
      case Some(j) => throw new IllegalStateException(
        s"operation ${node.name} crashed mid-run (journal " +
          s"${graft.core.Json.str(j("fingerprint")).take(16)}…, " +
          s"${j("completed")}/${j("total")} statements committed) and its " +
          "statements or input content have since changed — resuming " +
          "against different statements/inputs would break the " +
          "compensation pairing (e.g. delete documents whose negative " +
          "stats were never appended). Crash recovery runs automatically " +
          "at the start of every build, before models rebuild the " +
          "inputs, so this can only mean the operation's SQL (or a var " +
          "it renders) was edited over the partial run, or an input " +
          "table was mutated by hand. REPAIR: restore the operation's " +
          "statements/vars to the crashed run's form and re-run the " +
          "build; the resume completes the partial run first. The " +
          s"journal lives at <warehouse>/_graft_ops/${node.name}.json; " +
          "deleting it without completing the run leaves the stores " +
          "inconsistent.")
      case None =>
        val targetVersions = targets.sortBy(_.name).map { d =>
          s"${d.name}@${rm.currentState(relationFor(d)).map(_.version).getOrElse(0)}"
        }.mkString(",")
        (sha(stmtsHash, inputHash, targetVersions), 0)
    }
    def record(completed: Int): Unit = rm.writeOpJournal(node.name,
      s"""{"stmts_hash":${graft.core.Json.quote(stmtsHash)},""" +
        s""""input_hash":${graft.core.Json.quote(inputHash)},""" +
        s""""fingerprint":${graft.core.Json.quote(fp)},""" +
        s""""changes":{${windows.toSeq.sortBy(_._1).map { case (n, (f, t)) =>
          s"${graft.core.Json.quote(n)}:[$f,$t]" }.mkString(",")}},""" +
        s""""completed":$completed,"total":${rendered.size}}""")
    if (prior.isEmpty) record(0)
    var rows = 0L
    try {
      for ((stmt, i) <- rendered.zipWithIndex if i >= start) {
        rows += org.apache.spark.sql.graft.source.GraftOpTxn
          .withTxn(s"graft-op:${node.name}:${fp.take(16)}", i.toLong) {
            spark.sql(stmt).collect().length.toLong
          }
        Runner.opBoundaryHook(node.name, i, "committed")
        record(i + 1)
        Runner.opBoundaryHook(node.name, i, "journaled")
      }
      // advance the change cursors BEFORE the journal drops: a crash
      // between the two re-runs a zero-statement resume, rewrites the
      // same cursor values, and deletes the journal — idempotent. A
      // cursor only ever advances when every statement that consumed its
      // window has committed. (Deleting the cursors file replays the
      // whole feed — the witness law makes the replay a no-op, which is
      // the documented lever for lookback re-ingests that resurrect
      // already-deleted rows.)
      if (windows.nonEmpty) rm.writeOpJournal(s"${node.name}.cursors",
        (cursors ++ windows.map { case (n, (_, t)) => n -> t.toLong })
          .toSeq.sortBy(_._1)
          .map { case (n, v) => s"${graft.core.Json.quote(n)}:$v" }
          .mkString("{", ",", "}"))
      rm.deleteOpJournal(node.name)
    } finally {
      // ENGINE commits re-register a relation's session view ("a data
      // commit supersedes any prior view materialization" — commit()),
      // but connector commits happen inside Spark's V2 writer and don't:
      // a downstream consumer in the SAME session would keep reading the
      // view pinned at the last engine commit — pre-DML state. The
      // operation knows exactly which relations it may have mutated (its
      // refs), so refresh them — in a FINALLY (r18): a crash mid-run has
      // already committed some statements, and the next same-session
      // build (retry) would otherwise read MIXED pre/post-DML state
      // across this operation's stores.
      node.dependsOn.flatMap(manifest.get)
        .filter(d => NodeType.refable(d.nodeType) && !d.isEphemeral)
        .foreach { d =>
          val r = relationFor(d)
          if (rm.currentState(r).isDefined) rm.register(r)
        }
    }
    (rendered.size, rows)
  }

  private def runHooks(node: Node, hooks: Seq[String]): Unit = {
    hooks.foreach(h => spark.sql(renderSnippet(node, h)).collect())
    // a hook may have mutated {{ this }} through the V2 DML path, whose
    // connector commit does not re-register the session view (engine
    // commits do) — refresh so same-session consumers read post-hook state
    if (hooks.nonEmpty) {
      val rel = relationFor(node)
      if (rm.currentState(rel).isDefined) rm.register(rel)
    }
  }

  private def runNode(node: Node): RunResult = {
    val start = Instant.now()
    try {
      runHooks(node, node.config.preHooks)
      node.nodeType match {
        case NodeType.Seed =>
          val rel = relationFor(node)
          node.code match {
            case Some(CsvCode(csv)) =>
              val columnTypes = node.config.meta.collect {
                case (k, v) if k.startsWith("column_types.") => k.stripPrefix("column_types.") -> v
              }
              Materializations.seed(rm, rel, csv, columnTypes)
            case _ => throw new IllegalStateException(s"seed ${node.name} needs CSV code")
          }
          runHooks(node, node.config.postHooks)
          RunResult(node.uniqueId, "success", start, Instant.now())
        case NodeType.Snapshot =>
          // snapshot config via meta: strategy, updated_at | check_cols,
          // optional snapshot_at for a deterministic clock
          val rel = relationFor(node)
          val meta = node.config.meta
          val at = meta.get("snapshot_at").map(Instant.parse)
            .getOrElse(Instant.now())
          val strategy = meta.getOrElse("strategy", "timestamp") match {
            case "timestamp" => Snapshot.TimestampStrategy(meta.getOrElse("updated_at",
              throw new IllegalArgumentException(s"snapshot ${node.name} needs updated_at")))
            case "check" => Snapshot.CheckStrategy(at)
            case other => throw new IllegalArgumentException(s"snapshot strategy: $other")
          }
          val checkCols = meta.get("check_cols").map(_.split("\\s*\\|\\s*").toSeq).getOrElse(Seq("all"))
          Snapshot(rm, rel, buildDf(node), node.config.uniqueKey, strategy,
            checkCols = checkCols,
            invalidateHardDeletes = meta.get("invalidate_hard_deletes").contains("true"),
            hardDeleteAt = Some(at))
          runHooks(node, node.config.postHooks)
          RunResult(node.uniqueId, "success", start, Instant.now())
        case NodeType.Model =>
          val rel = relationFor(node)
          // enforced contract: assert the SELECT's inferred schema equals
          // the declaration BEFORE any write — df.schema is the Spark form
          // of the reference's `select ... limit 0` empty-schema probe
          // (§get_assert_columns_equivalent)
          node.config.meta.get("contract_cols").foreach { order =>
            val declared = order.split("\\|").toSeq
              .map(c => c -> node.config.meta(s"contract.$c"))
            graft.quality.Contracts.assertEquivalent(
              s"model ${node.name}", buildDf(node).schema, declared)
          }
          var runMessage = "" // set by branches with a reportable outcome
          node.config.materialized match {
            case "view" =>
              Materializations.view(rm, rel, buildDf(node))
              // persist the compiled SELECT + dep relations so a FRESH
              // session (new CLI run selecting only a downstream node) can
              // lazily re-register the view chain (reference: views are
              // warehouse objects, manifest.json §materialization_view_default)
              node.code match {
                case Some(SqlCode(_)) =>
                  rm.writeViewDef(rel, compileSql(node), persistentDeps(node))
                case _ => () // native (DataFrame-function) views stay session-scoped
              }
            case "table" =>
              writeTableFor(node, rel)
            case "materialized_view" =>
              // materialized_view over the commit log: table storage + a
              // persisted refresh fingerprint (compiled-SQL hash + every
              // transitive input's commit-log version / source file stamp).
              // A build whose fingerprint matches is a no-op — the MV is
              // provably fresh because staleness is exactly "some input
              // committed a new version since the last refresh". SQL or
              // config drift routes through on_configuration_change =
              // apply (default: rebuild) | continue (keep, warn) | fail
              // (reference: materialized_view materialization,
              // core/dbt/artifacts/resources/v1/config.py
              // OnConfigurationChangeOption; RelationConfigChangeAction).
              val fp = mvFingerprint(node)
              val recorded = if (rm.exists(rel)) rm.readMvState(rel) else None
              val full = fullRefresh || node.config.fullRefresh
              def refresh(msg: String): String = {
                writeTableFor(node, rel)
                rm.writeMvState(rel, fp)
                msg
              }
              def sqlCfgOf(s: String): (String, String) = {
                val doc = Json.obj(Json.parse(s))
                (Json.str(doc("sql")), Json.str(doc("cfg")))
              }
              runMessage = recorded match {
                case Some(rec) if !full && rec == fp =>
                  "fresh (no input changed since last refresh)"
                case Some(rec) if !full && sqlCfgOf(rec) == sqlCfgOf(fp) =>
                  refresh("refreshed (inputs changed)")
                case Some(_) if !full =>
                  node.config.meta.getOrElse("on_configuration_change", "apply") match {
                    case "apply" => refresh("rebuilt (configuration changed)")
                    case "continue" =>
                      "configuration changed; on_configuration_change=continue — kept as-is"
                    case "fail" => throw new IllegalStateException(
                      s"materialized view ${node.name}: configuration changed " +
                        "and on_configuration_change=fail")
                    case other => throw new IllegalArgumentException(
                      s"on_configuration_change: $other")
                  }
                case _ => refresh(if (full) "rebuilt (full refresh)" else "built")
              }
            case "ephemeral" => () // never materialized; inlined by consumers
            case "incremental" if node.config.incrementalStrategy.contains("microbatch") =>
              // microbatch via the runner: derive run end (injectable for
              // determinism via config run_end), resume from the persisted
              // checkpoint, filter the built frame to each batch window
              // (reference: RunTask.handle_microbatch_model
              // core/dbt/task/run.py:337-703)
              val cfg = node.config
              val et = cfg.eventTime.getOrElse(throw new IllegalArgumentException(
                s"microbatch model ${node.name} requires event_time"))
              // run end: model config, else the run-level `run_end` var
              // (the reference's --event-time-end flag: one knob advances
              // every microbatch model's window per scheduled run), else
              // wall-clock now
              val runEnd = cfg.meta.get("run_end").orElse(vars.get("run_end"))
                .map(Instant.parse).getOrElse(Instant.now())
              val full = fullRefresh || cfg.fullRefresh
              if (full && rm.exists(rel)) rm.drop(rel)
              val checkpoint = if (full) None else rm.readCheckpoint(rel)
              // is_incremental() must be false on the initial build — a
              // model whose incremental block references {{ this }} would
              // otherwise query a nonexistent relation (ADVICE r2)
              val isInc = rm.exists(rel)
              // batches run concurrently unless the model reads its own
              // prior state ({{ this }} / is_incremental()), overridable
              // with concurrent_batches — the reference's auto-detection
              // (microbatch concurrency, core/dbt/task/run.py:337-703,
              // ModelNode.has_this / concurrent_batches config)
              val selfRef = node.code match {
                case Some(SqlCode(sql)) =>
                  sql.contains("{{ this }}") || sql.contains("is_incremental()")
                case _ => true
              }
              // concurrent_batches: true/false, or an explicit slot count;
              // the default slot count is the runner's --threads (a 365-
              // batch backfill wants the task pool, not a constant —
              // VERDICT r3 wrongness #2)
              val slots = cfg.meta.get("concurrent_batches") match {
                case Some("false") => 1
                case Some("true")  => threads
                case Some(n)       => n.toInt
                case None          => if (selfRef) 1 else threads
              }
              graft.materializations.Microbatch.run(rm, rel,
                // the batch window reaches BOTH the model's event-time-
                // declaring refs (injected filters — per-batch work stays
                // O(batch)) and its own output frame
                b => buildDf(node, isIncremental = isInc, batchWindow = Some(b))
                  .filter(graft.materializations.Microbatch.eventTimeFilter(et, b)),
                cfg, runEnd, checkpoint,
                concurrency = slots,
                // schema-only bootstrap for bucket-declared stores (r17):
                // every input limited to zero rows, so an eager native
                // body costs nothing at the v0 declaration commit
                bootstrapBuild = Some(b => withEmptyInputs {
                  buildDf(node, isIncremental = isInc, batchWindow = Some(b))
                }))
            case "incremental" =>
              Materializations.incremental(rm, rel,
                inc => buildDf(node, isIncremental = inc),
                node.config.copy(fullRefresh = fullRefresh || node.config.fullRefresh))
            case other =>
              throw new IllegalArgumentException(s"materialized: $other")
          }
          // declared table properties (r17 — the dbt-spark adapter's
          // `tblproperties` config): `tblprops.<k>` in config()/meta
          // lands on the committed table, e.g. tblprops.row_level_mode =
          // merge-on-read turns a store's SQL DML into positional
          // deletes (the O(deleted-rows) GC mode for bucketed stores —
          // SCALE.md r17). Applied only when a declared key differs from
          // the table's current value, so an unchanged incremental /
          // microbatch build commits nothing extra (the O(batch) gates'
          // idempotency discipline).
          val tblProps = node.config.meta.collect {
            case (k, v) if k.startsWith("tblprops.") =>
              k.stripPrefix("tblprops.") -> v
          }
          if (tblProps.nonEmpty && node.config.materialized != "ephemeral") {
            val cur = rm.currentState(rel).getOrElse(
              throw new IllegalArgumentException(
                s"${node.name}: tblprops declared but the model is not a " +
                  s"commit-log table (materialized: ${node.config.materialized})"))
            if (tblProps.exists { case (k, v) => !cur.props.get(k).contains(v) })
              rm.setTableProperties(rel, tblProps)
          }
          runHooks(node, node.config.postHooks)
          RunResult(node.uniqueId, "success", start, Instant.now(), runMessage)
        case NodeType.Test =>
          val failing = node.code match {
            case None if node.columnTest.isDefined =>
              // schema-declared generic test: `where` wraps the tested
              // model's INPUT before the test logic runs — the reference's
              // get_where_subquery semantics (a predicate on model columns
              // must apply pre-aggregation, ADVICE r2)
              import org.apache.spark.sql.functions.expr
              val tested = manifest(node.testedNode.getOrElse(
                throw new IllegalStateException(s"${node.name}: tested node unresolved")))
              val input0 = spark.table(resolveRelationName(tested))
              val input = node.config.where.map(w => input0.filter(expr(w))).getOrElse(input0)
              val args = node.config.meta.collect {
                case (k, v) if k.startsWith("arg.") => k.stripPrefix("arg.") -> v
              }
              val column = node.columnTest.get
              node.config.meta("test_name") match {
                case "relationships" =>
                  // needs the parent frame: `to=<model> field=<col>`
                  val parent = manifest.byName(args.getOrElse("to",
                    throw new IllegalArgumentException(s"${node.name}: relationships needs to=")))
                    .getOrElse(throw new NoSuchElementException(s"${node.name}: unknown parent"))
                  GenericTests.relationships(input, column,
                    spark.table(resolveRelationName(parent)), args.getOrElse("field", column))
                case "unique_combination" =>
                  GenericTests.uniqueCombination(input, column.split("\\|").toSeq)
                case name =>
                  GenericTests.TestRegistry(name)(input, column, args)
              }
            case _ =>
              // singular SQL test: the SELECT already produces failing rows,
              // so `where` filters that OUTPUT — documented divergence from
              // get_where_subquery, which has no {{ model }} to wrap here
              node.config.where.foldLeft(buildDf(node))(
                (df, w) => df.filter(org.apache.spark.sql.functions.expr(w)))
          }
          // store_failures: persist failing rows under the audit schema
          // BEFORE reducing to the one-row verdict (reference:
          // core/dbt/task/test.py store_failures → <schema>_dbt_test__audit)
          if (node.config.storeFailures) {
            val audit = Relation(database, defaultSchema + "_graft_audit", node.name)
            GenericTests.storeFailures(rm, audit, failing)
          }
          val (_, res) = GenericTests.wrap(failing, GenericTests.TestConfig(
            severity = node.config.severity,
            warnIf = node.config.warnIf,
            errorIf = node.config.errorIf,
            failCalc = node.config.failCalc,
            limit = node.config.limit))
          val status =
            if (res.shouldError && node.config.severity == "error") "fail"
            else if (res.shouldWarn || res.shouldError) "warn"
            else "pass"
          RunResult(node.uniqueId, status, start, Instant.now(),
            s"${res.failures} failures")
        case NodeType.Unit =>
          // project-declared unit test: fixtures replace the model's refs,
          // result diffs against expect; failure BLOCKS the model (the unit
          // node is a dependency of its model — reference: unit tests run
          // before the model they test, task/build.py ordering)
          val model = manifest(node.testedNode.getOrElse(
            throw new IllegalStateException(s"unit ${node.name}: unknown model")))
          val given = node.config.meta.collect {
            case (k, v) if k.startsWith("unit_given.") =>
              graft.quality.UnitTests.Fixture(
                k.stripPrefix("unit_given."), graft.quality.UnitTests.csvRows(v))
            case (k, v) if k.startsWith("unit_given_sql.") =>
              graft.quality.UnitTests.Fixture(
                k.stripPrefix("unit_given_sql."), Nil, sql = Some(v))
          }.toSeq
          val expectSql = node.config.meta.get("unit_expect_sql")
          val expect = node.config.meta.get("unit_expect")
            .map(graft.quality.UnitTests.csvRows).getOrElse(Nil)
          // schema-aware fixture conformance when the real dep is built
          val realSchemas = model.dependsOn.flatMap(manifest.get)
            .filter(d => NodeType.refable(d.nodeType))
            .flatMap { d =>
              val r = relationFor(d)
              if (rm.exists(r)) Some(d.name -> rm.read(r).schema) else None
            }.toMap
          val res = graft.quality.UnitTests.run(spark,
            graft.quality.UnitTests.UnitTest(node.name, model, given, expect, expectSql),
            realSchemas, vars)
          RunResult(node.uniqueId, if (res.passed) "pass" else "fail",
            start, Instant.now(),
            if (res.passed) "" else
              s"actual-only: ${res.actualOnly.take(3).mkString(";")} " +
                s"expected-only: ${res.expectedOnly.take(3).mkString(";")}")
        case NodeType.SavedQuery =>
          // declared saved query: assemble the semantic model from its
          // declaration, compile metrics, materialize every export
          // (reference: v1/saved_query.py:34-96; the reference hands this
          // to MetricFlow, here the metric compiler runs it directly)
          import org.apache.spark.sql.functions.expr
          import graft.semantic.{Metrics, SavedQueries}
          val sem = manifest(node.dependsOn.headOption.getOrElse(
            throw new IllegalStateException(s"${node.name}: no semantic model")))
          val m = sem.config.meta
          val baseNode = manifest.byName(m("model")).getOrElse(
            throw new NoSuchElementException(s"${sem.name}: unknown model '${m("model")}'"))
          val base = spark.table(resolveRelationName(baseNode))
          def agg(s: String): Metrics.Agg = s match {
            case "sum" => Metrics.Sum; case "min" => Metrics.Min
            case "max" => Metrics.Max; case "count" => Metrics.Count
            case "count_distinct" => Metrics.CountDistinct
            case "sum_boolean" => Metrics.SumBoolean
            case "avg" | "average" => Metrics.Average
            case "median" => Metrics.Median
            case p if p.startsWith("percentile_") =>
              Metrics.Percentile(p.stripPrefix("percentile_").toDouble)
            case other => throw new IllegalArgumentException(s"measure agg: $other")
          }
          val semModel = Metrics.SemanticModel(
            base = base,
            timeDimension = m.get("time_dimension_name")
              .map(n => n -> expr(m("time_dimension_expr"))),
            dimensions = m.collect { case (k, v) if k.startsWith("dim.") =>
              k.stripPrefix("dim.") -> expr(v) },
            measures = m.collect { case (k, v) if k.startsWith("measure.") =>
              val Array(a, e) = v.split("\\|", 2)
              Metrics.Measure(k.stripPrefix("measure."), expr(e), agg(a))
            }.toSeq)
          def metric(name: String): Metrics.Metric = {
            val parts = m.getOrElse(s"metric.$name", throw new NoSuchElementException(
              s"${sem.name}: unknown metric '$name'")).split("\\|").toSeq
            parts match {
              case Seq("simple", ms)     => Metrics.Simple(name, ms)
              case Seq("ratio", n, d)    => Metrics.Ratio(name, n, d)
              case Seq("cumulative", ms) => Metrics.Cumulative(name, ms)
              case Seq("cumulative", ms, k) => Metrics.Cumulative(name, ms, Some(k.toInt))
              // metric: <name>: derived: <arithmetic over measures>
              // (v1/metric.py DerivedTypeParams; Metrics.derived)
              case "derived" +: rest if rest.nonEmpty =>
                Metrics.derived(name, rest.mkString("|"),
                  semModel.measures.map(_.name).toSet)
              case other => throw new IllegalArgumentException(s"metric def: $other")
            }
          }
          val sqMeta = node.config.meta
          val sq = SavedQueries.SavedQuery(
            name = node.name,
            model = semModel,
            metrics = sqMeta("metrics").split("\\s*\\|\\s*").toSeq.map(metric),
            grain = sqMeta.get("grain").toSeq.flatMap(_.split("\\s*\\|\\s*")).filter(_.nonEmpty),
            where = sqMeta.get("where").map(expr),
            exports = sqMeta.collect { case (k, v) if k.startsWith("export.") =>
              val (as, schema) = v.split(":", 2) match {
                case Array(a, s) => (a.trim, Some(s.trim))
                case Array(a)    => (a.trim, None)
              }
              SavedQueries.Export(k.stripPrefix("export."), as, schema)
            }.toSeq)
          SavedQueries.run(rm, defaultSchema, sq)
          runHooks(node, node.config.postHooks)
          RunResult(node.uniqueId, "success", start, Instant.now(),
            s"${sq.exports.size} exports")
        case NodeType.Operation =>
          // --empty is a schema-only DRY RUN: models see zero-row inputs
          // and write empty state, but an operation's statements are raw
          // DML against committed stores — running them would mutate
          // real state from inside a dry run (r18 self-review). Skip,
          // loudly attributed, like the reference's empty-run contract.
          if (emptyRun)
            RunResult(node.uniqueId, "success", start, Instant.now(),
              "skipped (--empty: operations run DML against real stores)")
          else {
            runHooks(node, node.config.preHooks)
            val (nStmts, _) = runOperationNode(node)
            runHooks(node, node.config.postHooks)
            RunResult(node.uniqueId, "success", start, Instant.now(),
              s"$nStmts statements")
          }
        case _ =>
          RunResult(node.uniqueId, "success", start, Instant.now(), "no-op")
      }
    } catch {
      case e: Throwable =>
        RunResult(node.uniqueId, "error", start, Instant.now(),
          Option(e.getMessage).getOrElse(e.getClass.getName))
    }
  }

  /** Execute selected nodes in DAG order with `threads` concurrency;
    * failures skip descendants (reference: runnable.py:70
    * mark_node_as_skipped). `withTestEdges` adds build-style test→child
    * blocking (compilation.py:210-340). */
  def run(select: Seq[String] = Nil, exclude: Seq[String] = Nil,
          withTestEdges: Boolean = false,
          onRunStart: Seq[String] = Nil, onRunEnd: Seq[String] = Nil,
          // which node kinds this task executes: `dbt run` = models only,
          // `build` = everything executable (reference: task RUNNER_MAPs,
          // core/dbt/task/build.py:38-47)
          resourceTypes: Set[NodeType] = NodeType.executable): Seq[RunResult] = {
    // on-run-start hooks (reference: core/dbt/hooks.py; run in
    // task/run.py). ref()/source() resolve like operations (r17 — the
    // reference's on-run-start/end context carries ref): DML-able names
    // for committed tables, and a ref to a never-built relation fails
    // in analysis, loudly.
    onRunStart.foreach(h => spark.sql(renderOperation(h)).collect())
    // CRASH RECOVERY (r18): an operation that died between statements
    // left a journal; its remaining statements are OWED to the stores
    // before ANY node — a pre-op freshness test, a consumer model —
    // reads their mid-operation state. Resume FIRST, unconditionally of
    // selection: no model has rerun yet, so the persisted input tables
    // still hold exactly the crashed run's content and the resume
    // completes the run it belongs to, whatever this build's selection
    // or vars. A validation mismatch (statement drift over a partial
    // run) throws and aborts the whole build — the stores need operator
    // attention before anything else runs.
    // (not under --empty: recovery completes REAL DML; a dry run must
    // neither mutate stores nor consume the journal)
    if (!emptyRun)
      manifest.nodes.values.toSeq.sortBy(_.name)
        .filter(_.nodeType == NodeType.Operation)
        .foreach(n => runOperationNode(n, resumeOnly = true))
    val selected0 = Selector.select(manifest, select, exclude,
      previousState, previousResults)
    val selected = selected0.filter(id =>
      NodeType.executable(manifest(id).nodeType) && resourceTypes(manifest(id).nodeType))
    val mf =
      if (!withTestEdges) manifest
      else {
        val extra = manifest.testEdges
        Manifest(manifest.nodes.map { case (id, n) =>
          val blockers = extra.collect { case (t, c) if c == id => t }
          id -> n.copy(dependsOn = (n.dependsOn ++ blockers).distinct)
        })
      }
    val queue = new GraphQueue(mf, selected)
    val results = new ConcurrentHashMap[String, RunResult]()
    val pool = Executors.newFixedThreadPool(threads)
    val pending = new java.util.concurrent.atomic.AtomicInteger(0)
    val done = new Object
    // --fail-fast: first failure's node name; once set, no new node starts
    val abortedBy = new java.util.concurrent.atomic.AtomicReference[String](null)

    def pump(): Unit = {
      if (failFast && abortedBy.get != null) return
      var next = queue.poll()
      while (next.isDefined) {
        val id = next.get
        pending.incrementAndGet()
        pool.submit(new Runnable {
          def run(): Unit = {
            // fail-fast re-check at execution time: poll() and the abort
            // flag race, so a node can be SUBMITTED concurrently with the
            // first failure — skip it here rather than run it after the
            // abort (in-flight nodes still finish, dbt-style; this only
            // stops not-yet-started work)
            if (failFast && abortedBy.get != null) {
              results.put(id, RunResult(id, "skipped", Instant.now(), Instant.now(),
                s"fail-fast: run aborted after ${abortedBy.get} failed"))
              pending.decrementAndGet()
              done.synchronized { done.notifyAll() }
              return
            }
            val r = runNode(mf(id))
            results.put(id, r)
            if (r.status == "error" || r.status == "fail") {
              if (failFast) abortedBy.compareAndSet(null, mf(id).name)
              val skipped = queue.markFailed(id)
              skipped.foreach { s =>
                results.put(s, RunResult(s, "skipped", Instant.now(), Instant.now(),
                  s"upstream ${mf(id).name} ${r.status}"))
              }
            } else queue.markDone(id)
            pending.decrementAndGet()
            done.synchronized { done.notifyAll() }
            pump()
          }
        })
        if (failFast && abortedBy.get != null) return
        next = queue.poll()
      }
    }

    pump()
    done.synchronized {
      while (pending.get() > 0 ||
          (!queue.finished && !(failFast && abortedBy.get != null)))
        done.wait(50)
    }
    pool.shutdown()
    pool.awaitTermination(1, TimeUnit.HOURS)
    // fail-fast: everything that never started is skipped, loudly
    Option(abortedBy.get).foreach { failedName =>
      selected.foreach { id =>
        results.putIfAbsent(id, RunResult(id, "skipped", Instant.now(), Instant.now(),
          s"fail-fast: run aborted after $failedName failed"))
      }
    }
    onRunEnd.foreach(h => spark.sql(renderOperation(h)).collect())
    // deterministic report order
    results.values().asScala.toSeq.sortBy(_.uniqueId)
  }

  /** Write run_results.json in the REFERENCE's v6 shape (schema
    * schemas/dbt/run-results/v6.json, core/dbt/artifacts/schemas/run/):
    * metadata + per-result timing/thread/adapter_response and the
    * nullable compiled/relation fields the schema requires — loadable by
    * external dbt tooling; retry keeps reading unique_id/status. */
  def writeRunResults(results: Seq[RunResult], path: String): Unit = {
    def q(s: String) = Json.quote(s)
    val rows = results.map { r =>
      s"""{"unique_id":${q(r.uniqueId)},"status":${q(r.status)},""" +
        s""""timing":[{"name":"execute","started_at":${q(r.startedAt.toString)},""" +
        s""""completed_at":${q(r.completedAt.toString)}}],""" +
        s""""thread_id":"main","execution_time":${r.executionSeconds},""" +
        s""""adapter_response":{},"message":${q(r.message)},"failures":null,""" +
        s""""compiled":null,"compiled_code":null,"relation_name":null}"""
    }
    val json =
      s"""{"metadata":{"dbt_schema_version":"https://schemas.getdbt.com/dbt/run-results/v6.json",""" +
        s""""generated_at":${q(Instant.now().toString)}},""" +
        s""""results":[${rows.mkString(",")}],""" +
        s""""elapsed_time":${results.map(_.executionSeconds).sum},"args":{}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }
}

object Runner {
  /** Test seam (r18): invoked after each operation statement's commit and
    * again after its journal record — the fault-injection spec kills the
    * run at each boundary to prove crash-exact resume. Phases:
    * "committed" (statement done, journal NOT yet updated — the window
    * the per-statement replay-guard txn covers) and "journaled". */
  @volatile private[graft] var opBoundaryHook: (String, Int, String) => Unit =
    (_, _, _) => ()

  /** Split an operation body on `;;` OUTSIDE quotes and comments (r18,
    * VERDICT r17 #3): a `;;` inside a `'...'` / `"..."` / backtick
    * literal, a `--` line comment, or a slash-star block comment is part
    * of the statement, not a separator. SQL quote escaping doubles the
    * quote (`''`), which this scanner reads as close-then-reopen — the
    * net effect (still inside a literal) is identical, so no lookahead
    * is needed. */
  private[graft] def splitStatements(raw: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var quote: Char = 0 // 0 = outside; '\'' | '"' | '`' = inside
    var lineComment = false
    var blockComment = false
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (lineComment) { if (c == '\n') lineComment = false; cur += c; i += 1 }
      else if (blockComment) {
        if (c == '*' && i + 1 < raw.length && raw.charAt(i + 1) == '/') {
          cur ++= "*/"; blockComment = false; i += 2
        } else { cur += c; i += 1 }
      } else if (quote != 0) {
        if (c == quote) quote = 0
        cur += c; i += 1
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur += c; i += 1
        case '-' if i + 1 < raw.length && raw.charAt(i + 1) == '-' =>
          lineComment = true; cur ++= "--"; i += 2
        case '/' if i + 1 < raw.length && raw.charAt(i + 1) == '*' =>
          blockComment = true; cur ++= "/*"; i += 2
        case ';' if i + 1 < raw.length && raw.charAt(i + 1) == ';' =>
          out += cur.result(); cur.clear(); i += 2
        case _ => cur += c; i += 1
      }
    }
    out += cur.result()
    out.result()
  }
}
