package graft.core

/** Node-selection algebra (reference: grammar RAW_SELECTOR_PATTERN
  * core/dbt/graph/selector_spec.py:15-24; methods
  * core/dbt/graph/selector_methods.py:45-66; set composition
  * core/dbt/graph/selector.py:102+).
  *
  * Supported: `name`, `+name`, `name+`, `2+name+3`, `@name`,
  * `method:value` for methods fqn/tag/group/source/path/package/config.x/
  * resource_type/test_type/state, unions (space / multiple specs),
  * intersections (`,`), and exclusion sets.
  */
object Selector {

  private val Pattern = """^(@)?(?:(\d*)(\+))?(?:([a-zA-Z_.*]+):)?([^+]+?)(?:(\+)(\d*))?$""".r

  final case class Spec(
      atOp: Boolean,
      parentsDepth: Option[Int],  // None = no parents op; Some(-1) = unbounded
      method: Option[String],
      value: String,
      childrenDepth: Option[Int])

  def parseOne(raw: String): Spec = raw.trim match {
    case Pattern(at, pdepth, pplus, method, value, cplus, cdepth) =>
      Spec(
        atOp = at != null,
        parentsDepth = Option(pplus).map(_ => if (pdepth == null || pdepth.isEmpty) -1 else pdepth.toInt),
        method = Option(method),
        value = value,
        childrenDepth = Option(cplus).map(_ => if (cdepth == null || cdepth.isEmpty) -1 else cdepth.toInt))
    case other => throw new IllegalArgumentException(s"bad selector: '$other'")
  }

  /** Evaluate a full selection expression: space/comma composition like
    * `dbt run -s "a+ b" -s "c,tag:x"`.
    * Each string in `select` is a union term; within a term, comma =
    * intersection. `exclude` subtracts. */
  def select(
      manifest: Manifest,
      select: Seq[String],
      exclude: Seq[String] = Nil,
      previousState: Option[Manifest] = None,
      previousResults: Map[String, String] = Map.empty): Set[String] = {
    val all = manifest.nodes.keySet
    val included =
      if (select.isEmpty) all
      else select.flatMap(term => evalTerm(manifest, term, previousState, previousResults)).toSet
    val excluded = exclude.flatMap(term => evalTerm(manifest, term, previousState, previousResults)).toSet
    included -- excluded
  }

  private def evalTerm(m: Manifest, term: String, prev: Option[Manifest],
                       prevResults: Map[String, String] = Map.empty): Set[String] = {
    // space = union, comma = intersection (dbt: intersection binds tighter)
    term.split("\\s+").filter(_.nonEmpty).map { unionPart =>
      unionPart.split(",").filter(_.nonEmpty)
        .map(p => evalSpec(m, parseOne(p), prev, prevResults))
        .reduceLeft(_ intersect _)
    }.foldLeft(Set.empty[String])(_ union _)
  }

  def evalSpec(m: Manifest, s: Spec, prev: Option[Manifest] = None,
               prevResults: Map[String, String] = Map.empty): Set[String] = {
    val base = baseMatch(m, s, prev, prevResults)
    val withParents = s.parentsDepth.fold(Set.empty[String]) { d =>
      base.flatMap(id => Dag.ancestors(m.parentMap, id, d))
    }
    val withChildren = s.childrenDepth.fold(Set.empty[String]) { d =>
      base.flatMap(id => Dag.descendants(m.childMap, id, d))
    }
    val expanded = base ++ withParents ++ withChildren
    if (s.atOp) {
      // @model = model, its descendants, and all ancestors of those
      // (reference: graph.py:55 select_childrens_parents)
      val kids = base.flatMap(id => Dag.descendants(m.childMap, id)) ++ base
      kids ++ kids.flatMap(id => Dag.ancestors(m.parentMap, id))
    } else expanded
  }

  private def glob(pat: String, s: String): Boolean =
    java.util.regex.Pattern.matches(
      pat.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*"), s)

  private def baseMatch(m: Manifest, s: Spec, prev: Option[Manifest],
                        prevResults: Map[String, String]): Set[String] = {
    val method = s.method.getOrElse("fqn")
    m.nodes.collect {
      case (id, n) if matches(m, method, s.value, n, prev, prevResults) => id
    }.toSet
  }

  private def isLatestVersion(m: Manifest, n: Node): Boolean =
    n.config.versionedOf.exists { family =>
      m.nodes.values.filter(_.config.versionedOf.contains(family))
        .maxBy(_.config.version.getOrElse(0)).uniqueId == n.uniqueId
    }

  private def matches(m: Manifest, method: String, value: String, n: Node,
                      prev: Option[Manifest],
                      prevResults: Map[String, String] = Map.empty): Boolean =
    method match {
      case "fqn" => n.name == value || glob(value, n.name) ||
        (n.fqn.nonEmpty && glob(value, n.fqn.mkString(".")))
      // exact-node addressing for retry/defer: a model and a test sharing a
      // bare name must not co-select (reference: retry replays unique_ids)
      case "unique_id" => n.uniqueId == value || glob(value, n.uniqueId)
      case "tag" => n.config.tags.exists(t => glob(value, t))
      case "group" => n.config.group.exists(g => glob(value, g))
      case "source" => n.nodeType == NodeType.Source &&
        (glob(value, n.name) || n.sources.exists { case (src, _) => glob(value, src) })
      case "path" | "file" => n.path.exists(p => glob(value, p))
      case "package" => glob(value, n.packageName)
      case "resource_type" => n.nodeType.name == value
      case "test_type" => n.nodeType == NodeType.Test &&
        (value match {
          case "generic"  => n.columnTest.isDefined
          case "singular" => n.columnTest.isEmpty
          case _          => false
        })
      case "test_name" => n.nodeType == NodeType.Test && glob(value, n.name)
      case "exposure" => n.nodeType == NodeType.Exposure && glob(value, n.name)
      case "metric" => n.nodeType == NodeType.Metric && glob(value, n.name)
      // semantic_model: / saved_query: / unit_test: — name-glob over the
      // declarative node types (reference: selector_methods.py:45-66
      // SemanticModelSelectorMethod / SavedQuerySelectorMethod /
      // UnitTestSelectorMethod)
      case "semantic_model" => n.nodeType == NodeType.SemanticModel && glob(value, n.name)
      case "saved_query" => n.nodeType == NodeType.SavedQuery && glob(value, n.name)
      case "unit_test" => n.nodeType == NodeType.Unit && glob(value, n.name)
      case "config.materialized" => n.config.materialized == value
      case "config.severity" => n.config.severity == value
      // access:private|protected|public (reference: selector_methods.py
      // AccessSelectorMethod; v1/model.py:19-23)
      case "access" => n.config.access == value
      // version:latest|old|none|<N> (reference: VersionSelectorMethod)
      case "version" => value match {
        case "latest" => n.config.version.isDefined && isLatestVersion(m, n)
        case "old"    => n.config.version.isDefined && !isLatestVersion(m, n)
        case "none"   => n.config.version.isEmpty
        case v        => n.config.version.contains(v.toInt)
      }
      // source_status:<status> from a previous freshness run's sources.json
      // (reference: SourceStatusSelectorMethod; statuses merge into the
      // same previous-results map as run_results — id namespaces disjoint)
      case "source_status" => n.nodeType == NodeType.Source &&
        prevResults.get(n.uniqueId).contains(value)
      // result:<status> from a previous run's results
      // (reference: selector_methods.py ResultSelectorMethod; used by retry)
      case "result" => prevResults.get(n.uniqueId).contains(value)
      case "state" => value match {
        // state:new / state:modified vs a previous manifest
        // (reference: selector_methods.py StateSelectorMethod)
        case "new"      => prev.exists(p => !p.nodes.contains(n.uniqueId))
        case "modified" => prev.exists { p =>
          p.nodes.get(n.uniqueId).forall(_.checksum != n.checksum)
        }
        case "unmodified" => prev.exists { p =>
          p.nodes.get(n.uniqueId).exists(_.checksum == n.checksum)
        }
        case _ => false
      }
      case other => throw new IllegalArgumentException(s"unknown selector method: $other")
    }
}

/** Thread-safe priority scheduling queue over a selected sub-DAG
  * (reference: core/dbt/graph/queue.py:19-191 GraphQueue). Nodes become
  * available when all selected parents completed; ties broken by depth
  * score then id for determinism.
  */
final class GraphQueue(manifest: Manifest, selected: Set[String]) {
  private val lock = new Object
  private val parents: Map[String, Set[String]] =
    selected.map(id => id -> manifest.parentMap.getOrElse(id, Nil)
      .filter(selected).toSet).toMap
  private val scores = Dag.depthScores(manifest.parentMap)
  private val done = collection.mutable.Set.empty[String]
  private val inFlight = collection.mutable.Set.empty[String]

  /** Pop the next ready node, or None if none ready now (or all finished). */
  def poll(): Option[String] = lock.synchronized {
    val ready = selected.view
      .filterNot(done)
      .filterNot(inFlight)
      .filter(id => parents(id).forall(done))
      .toSeq
    val next = ready.sortBy(id => (scores.getOrElse(id, 0), id)).headOption
    next.foreach(inFlight.add)
    next
  }

  def markDone(id: String): Unit = lock.synchronized {
    inFlight.remove(id); done.add(id)
  }

  /** Skip a node and everything downstream of it (test failure / error —
    * reference: task/runnable.py:70 mark_node_as_skipped). Returns skipped. */
  def markFailed(id: String): Set[String] = lock.synchronized {
    inFlight.remove(id); done.add(id)
    val skipped = Dag.descendants(manifest.childMap, id).intersect(selected) -- done
    skipped.foreach(done.add)
    skipped
  }

  def finished: Boolean = lock.synchronized { done.size == selected.size }
  def remaining: Int = lock.synchronized { selected.size - done.size }
}
