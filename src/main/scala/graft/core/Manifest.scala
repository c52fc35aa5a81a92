package graft.core

/** The whole-project IR (reference: core/dbt/contracts/graph/manifest.py;
  * serialized schema v12 core/dbt/artifacts/schemas/manifest/v12/manifest.py:100-119).
  * Holds every node keyed by unique_id plus derived parent/child maps.
  */
final case class Manifest(nodes: Map[String, Node]) {

  lazy val parentMap: Map[String, Seq[String]] =
    nodes.map { case (id, n) => id -> n.dependsOn.filter(nodes.contains) }

  lazy val childMap: Map[String, Seq[String]] = {
    val edges = for {
      (id, parents) <- parentMap.toSeq
      p <- parents
    } yield p -> id
    edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      .withDefaultValue(Seq.empty)
  }

  def apply(id: String): Node = nodes(id)
  def get(id: String): Option[Node] = nodes.get(id)

  /** Name → refable node, version-aware (reference: versioned ref
    * resolution + latest_version, v1/model.py:40-53): `name##N` pins
    * version N of a family; a bare family name resolves to the highest
    * version; plain names resolve directly. */
  def byName(name: String): Option[Node] = {
    val refables = nodes.values.filter(n => NodeType.refable(n.nodeType))
    name.split("##", 2) match {
      case Array(base, v) =>
        refables.find(n => n.config.versionedOf.contains(base) &&
          n.config.version.contains(v.toInt))
      case _ =>
        refables.find(_.name == name).orElse {
          val family = refables.filter(_.config.versionedOf.contains(name))
          if (family.isEmpty) None
          else Some(family.maxBy(_.config.version.getOrElse(0)))
        }
    }
  }

  /** Resolve raw ref()/source() names into dependsOn unique_ids
    * (reference: parser/manifest.py:470 process_refs). Unknown refs throw,
    * mirroring dbt's "depends on a node which was not found" error. */
  def processRefs(sourcesPkg: String = "sources"): Manifest = {
    val resolved = nodes.map { case (id, n) =>
      val refDeps = n.refs.map { r =>
        byName(r).getOrElse(throw new NoSuchElementException(
          s"${n.uniqueId} refs unknown node '$r'")).uniqueId
      }
      val srcDeps = n.sources.map { case (s, t) => s"source.$sourcesPkg.${s}_$t" }
      // a Source node's `sources` field names ITSELF — without the self-edge
      // filter every sourced project "cycles" at schedule time
      id -> n.copy(dependsOn = (n.dependsOn ++ refDeps ++ srcDeps).distinct.filterNot(_ == id))
    }
    Manifest(resolved)
  }

  /** Add test→downstream edges so a model waits for its ancestors' tests,
    * like `dbt build` (reference: core/dbt/compilation.py:210-340
    * add_test_edges). Returns the extra edges (testId → childId). */
  def testEdges: Seq[(String, String)] = {
    val tests = nodes.values.filter(_.nodeType == NodeType.Test).toSeq
    for {
      t <- tests
      tested <- t.testedNode.toSeq
      child <- childMap(tested)
      if nodes(child).nodeType != NodeType.Test
    } yield t.uniqueId -> child
  }
}

object Manifest {
  def apply(ns: Seq[Node]): Manifest = {
    val m = ns.map(n => n.uniqueId -> n).toMap
    require(m.size == ns.size, "duplicate unique_ids")
    Manifest(m)
  }
}

/** Plain DAG helpers over the manifest (reference: core/dbt/compilation.py:132-210
  * Linker; core/dbt/graph/graph.py:12). Driver-side only — thousands of
  * nodes at most, never data-sized.
  */
object Dag {

  /** Kahn toposort; throws on cycles (Linker.check_for_cycles). */
  def topoSort(parents: Map[String, Seq[String]]): Seq[String] = {
    val inDeg = collection.mutable.Map.empty[String, Int]
    val children = collection.mutable.Map.empty[String, List[String]]
    parents.foreach { case (id, ps) =>
      inDeg.getOrElseUpdate(id, 0)
      ps.foreach { p =>
        inDeg.getOrElseUpdate(p, 0)
        inDeg(id) += 1
        children(p) = id :: children.getOrElse(p, Nil)
      }
    }
    val ready = collection.mutable.PriorityQueue.empty[String](Ordering[String].reverse)
    inDeg.foreach { case (id, d) => if (d == 0) ready.enqueue(id) }
    val out = collection.mutable.ArrayBuffer.empty[String]
    while (ready.nonEmpty) {
      val id = ready.dequeue()
      out += id
      children.getOrElse(id, Nil).foreach { c =>
        inDeg(c) -= 1
        if (inDeg(c) == 0) ready.enqueue(c)
      }
    }
    if (out.size != inDeg.size)
      throw new IllegalStateException(
        s"cycle detected among: ${inDeg.keySet -- out.toSet}")
    out.toSeq
  }

  /** Transitive closure helpers for the selector algebra
    * (reference: core/dbt/graph/graph.py:59-110). depth<0 = unbounded. */
  def ancestors(parents: Map[String, Seq[String]], id: String, depth: Int = -1): Set[String] =
    walk(parents, id, depth)

  def descendants(children: Map[String, Seq[String]], id: String, depth: Int = -1): Set[String] =
    walk(children, id, depth)

  private def walk(edges: Map[String, Seq[String]], start: String, depth: Int): Set[String] = {
    var frontier = Set(start)
    val seen = collection.mutable.Set(start)
    var d = depth
    while (frontier.nonEmpty && d != 0) {
      frontier = frontier.flatMap(f => edges.getOrElse(f, Nil)).filterNot(seen)
      seen ++= frontier
      d -= 1
    }
    seen.toSet - start
  }

  /** Depth score for scheduling: longest path from any root; ready nodes
    * with the lowest score run first (reference: core/dbt/graph/queue.py:97-119
    * _get_scores). */
  def depthScores(parents: Map[String, Seq[String]]): Map[String, Int] = {
    val order = topoSort(parents)
    val score = collection.mutable.Map.empty[String, Int]
    order.foreach { id =>
      val ps = parents.getOrElse(id, Nil)
      score(id) = if (ps.isEmpty) 0 else ps.map(p => score.getOrElse(p, 0)).max + 1
    }
    score.toMap
  }
}
