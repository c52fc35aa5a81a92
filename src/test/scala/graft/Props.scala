package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.core._
import graft.materializations.Microbatch
import java.time.Instant

/** ScalaCheck properties (SURVEY §5 implication (d)): the selector algebra
  * and microbatch batch-splitting math are pure functions with clean
  * algebraic laws — exactly the property-testing surface. */
object MicrobatchProps extends Properties("Microbatch") {
  import Microbatch._

  private val sizes = Gen.oneOf(Hour, Day, Month, Year)
  private val instants = Gen.choose(0L, 4102444800L).map(Instant.ofEpochSecond)
  private val spans = Gen.choose(1L, 400L * 24 * 3600)

  property("batches tile [trunc(start), end) exactly") =
    forAll(instants, spans, sizes) { (s, len, size) =>
      val e = s.plusSeconds(len)
      val bs = buildBatches(s, e, size)
      bs.nonEmpty &&
        bs.head._1 == truncate(s, size) &&
        bs.last._2 == e &&
        bs.forall { case (a, b) => a.isBefore(b) } &&
        bs.sliding(2).forall {
          case Seq((_, e1), (s2, _)) => e1 == s2
          case _ => true
        }
    }

  property("truncate is idempotent") =
    forAll(instants, sizes) { (t, size) => truncate(truncate(t, size), size) == truncate(t, size) }

  property("offset(n) then offset(-n) is identity on truncated timestamps") =
    forAll(instants, sizes, Gen.choose(1, 50)) { (t, size, n) =>
      offset(offset(t, size, n), size, -n) == truncate(t, size)
    }

  property("lookback start is always <= checkpoint") =
    forAll(instants, sizes, Gen.choose(0, 10)) { (cp, size, lb) =>
      !batchStart(Some(cp), cp, size, lb).isAfter(truncate(cp, size))
    }
}

object SelectorProps extends Properties("Selector") {
  private def model(name: String, deps: Seq[String], tag: Option[String]) =
    Node(NodeType.Model, "p", name,
      config = NodeConfig(tags = tag.toSet),
      dependsOn = deps.map(d => s"model.p.$d"), fqn = Seq("p", name))

  /** Random small DAGs: node i may depend on any subset of earlier nodes
    * (acyclic by construction). */
  private val manifests: Gen[Manifest] = for {
    n <- Gen.choose(2, 12)
    edges <- Gen.sequence[Seq[Seq[Int]], Seq[Int]](
      (0 until n).map(i => Gen.someOf(0 until i).map(_.toSeq)))
    tags <- Gen.listOfN(n, Gen.option(Gen.oneOf("red", "blue")))
  } yield Manifest((0 until n).map(i =>
    model(s"m$i", edges(i).map(j => s"m$j"), tags(i))))

  property("union is monotone: select(a) ⊆ select(a b)") =
    forAll(manifests, Gen.choose(0, 11), Gen.choose(0, 11)) { (m, i, j) =>
      val names = m.nodes.values.map(_.name).toSeq.sorted
      val (a, b) = (names(i % names.size), names(j % names.size))
      Selector.select(m, Seq(a)).subsetOf(Selector.select(m, Seq(s"$a $b")))
    }

  property("+x+ contains x, its ancestors, and its descendants") =
    forAll(manifests, Gen.choose(0, 11)) { (m, i) =>
      val names = m.nodes.values.map(_.name).toSeq.sorted
      val x = names(i % names.size)
      val id = s"model.p.$x"
      val full = Selector.select(m, Seq(s"+$x+"))
      full.contains(id) &&
        Dag.ancestors(m.parentMap, id).subsetOf(full) &&
        Dag.descendants(m.childMap, id).subsetOf(full)
    }

  property("exclusion removes exactly the excluded set") =
    forAll(manifests, Gen.choose(0, 11)) { (m, i) =>
      val names = m.nodes.values.map(_.name).toSeq.sorted
      val x = names(i % names.size)
      val all = Selector.select(m, Nil)
      Selector.select(m, Nil, exclude = Seq(x)) == all -- Selector.select(m, Seq(x))
    }

  property("toposort puts every parent before its child") =
    forAll(manifests) { m =>
      val order = Dag.topoSort(m.parentMap)
      val pos = order.zipWithIndex.toMap
      m.parentMap.forall { case (id, ps) => ps.forall(p => pos(p) < pos(id)) }
    }
}

/** The JSON layer underpins every artifact (commit-log manifests,
  * run_results, manifest.json): quote→parse must round-trip ANY string,
  * and structured documents must survive a write/read cycle. */
object JsonProps extends Properties("Json") {
  property("quote/parse round-trips arbitrary strings") =
    forAll { (s: String) => Json.parse(Json.quote(s)) == s }

  private val scalars: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr, Gen.choose(Long.MinValue, Long.MaxValue),
    Gen.oneOf(true, false), Gen.const(null))

  property("object documents round-trip through the writer shape") =
    forAll(Gen.mapOf(Gen.zip(Gen.alphaNumStr, scalars))) { m =>
      val body = m.map { case (k, v) =>
        Json.quote(k) + ":" + (v match {
          case s: String => Json.quote(s)
          case null      => "null"
          case other     => other.toString
        })
      }.mkString("{", ",", "}")
      Json.obj(Json.parse(body)) == m
    }

  property("escaped control chars survive") =
    forAll(Gen.listOf(Gen.choose(0.toChar, 31.toChar))) { cs =>
      val s = cs.mkString
      Json.parse(Json.quote(s)) == s
    }
}
