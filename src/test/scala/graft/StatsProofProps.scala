package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.source.GraftSourceTable
import graft.relations.{ColStats, Stats, TableVersion}

/** Soundness of the metadata-delete proofs: for RANDOM row sets and RANDOM
  * predicates, the per-file stats computed from the rows must never let
  * `mustMatch` claim "every row matches" when some row doesn't (that would
  * DELETE live data), and never let `!mayMatch` claim "no row matches"
  * when one does (that would skip a live file). The reference evaluator is
  * SQL three-valued logic: a row "matches" iff the predicate is TRUE (not
  * NULL). Row lists range over size 0..8 so the zero-row vacuous-truth
  * branch is exercised, and a dedicated property mixes real stats with a
  * partition pseudo-stat (rows = 1 placeholder) — the combinedStats shape
  * the planner actually feeds these proofs. */
object StatsProofProps extends Properties("StatsProofs") {

  // these proofs gate DATA DELETION — buy more random coverage than the
  // default 100 cases (the Not-on-nulls 3VL bug fell inside the first 100)
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(2000)

  private val C = "c"
  private val P = "p" // partition column (dir-encoded pseudo-stat)

  // rows: longs with nulls mixed in; size 0..8 (0 hits the vacuous branch)
  private val rowsGen: Gen[List[Option[Long]]] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      Gen.const(None),
      Gen.choose(-5L, 5L).map(Some(_)))))

  private val valueGen: Gen[Long] = Gen.choose(-6L, 6L)

  private def leafGen(col: Gen[String]): Gen[Filter] = col.flatMap { c =>
    Gen.oneOf(
      valueGen.map(v => EqualTo(c, v)),
      valueGen.map(v => GreaterThan(c, v)),
      valueGen.map(v => GreaterThanOrEqual(c, v)),
      valueGen.map(v => LessThan(c, v)),
      valueGen.map(v => LessThanOrEqual(c, v)),
      Gen.listOfN(3, valueGen).map(vs => In(c, vs.toArray.map(_.asInstanceOf[Any]))),
      Gen.const(IsNull(c)),
      Gen.const(IsNotNull(c)))
  }

  private def filterGen(depth: Int, col: Gen[String] = Gen.const(C)): Gen[Filter] =
    if (depth <= 0) leafGen(col)
    else Gen.frequency(
      4 -> leafGen(col),
      2 -> Gen.zip(filterGen(depth - 1, col), filterGen(depth - 1, col))
        .map { case (a, b) => And(a, b) },
      2 -> Gen.zip(filterGen(depth - 1, col), filterGen(depth - 1, col))
        .map { case (a, b) => Or(a, b) },
      1 -> filterGen(depth - 1, col).map(Not))

  /** SQL 3VL reference evaluation of one row (column name → value). */
  private def eval3(row: Map[String, Option[Long]], f: Filter): Option[Boolean] = f match {
    case And(l, r) => (eval3(row, l), eval3(row, r)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true))            => Some(true)
      case _                                   => None
    }
    case Or(l, r) => (eval3(row, l), eval3(row, r)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false))        => Some(false)
      case _                                 => None
    }
    case Not(x)       => eval3(row, x).map(!_)
    case IsNull(c)    => Some(row(c).isEmpty)
    case IsNotNull(c) => Some(row(c).isDefined)
    case EqualTo(c, x)            => row(c).map(_ == x.asInstanceOf[Long])
    case GreaterThan(c, x)        => row(c).map(_ > x.asInstanceOf[Long])
    case GreaterThanOrEqual(c, x) => row(c).map(_ >= x.asInstanceOf[Long])
    case LessThan(c, x)           => row(c).map(_ < x.asInstanceOf[Long])
    case LessThanOrEqual(c, x)    => row(c).map(_ <= x.asInstanceOf[Long])
    case In(c, xs)    => row(c).map(v => xs.exists(_.asInstanceOf[Long] == v))
    case other        => throw new IllegalArgumentException(other.toString)
  }

  private def matches(row: Map[String, Option[Long]], f: Filter): Boolean =
    eval3(row, f).contains(true)

  private def statsOf(rows: List[Option[Long]]): Map[String, ColStats] = {
    val present = rows.flatten
    Map(C -> ColStats(
      present.minOption.flatMap(Stats.canonical),
      present.maxOption.flatMap(Stats.canonical),
      rows.count(_.isEmpty).toLong,
      rows.size.toLong))
  }

  private val st = TableVersion(1, Seq("f0"),
    StructType(Seq(StructField(C, LongType))), Nil)

  property("mustMatch never overclaims: a proof means EVERY row matches") =
    forAll(rowsGen, filterGen(2)) { (rows, f) =>
      val cs = statsOf(rows)
      !GraftSourceTable.mustMatch(st, cs, f) ||
        rows.forall(v => matches(Map(C -> v), f))
    }

  property("!mayMatch never overclaims: a skip means NO row matches") =
    forAll(rowsGen, filterGen(2)) { (rows, f) =>
      val cs = statsOf(rows)
      GraftSourceTable.mayMatch(st, cs, f) ||
        rows.forall(v => !matches(Map(C -> v), f))
    }

  property("a zero-row file proves ANY predicate vacuously (and never skips soundly-matched rows, there being none)") =
    forAll(filterGen(2)) { f =>
      val cs = statsOf(Nil)
      GraftSourceTable.mustMatch(st, cs, f)
    }

  // ---- mixed real + partition pseudo-stat maps: the combinedStats shape --

  private val stPart = TableVersion(1, Seq("f0"),
    StructType(Seq(StructField(C, LongType), StructField(P, LongType))), Seq(P))

  /** Dir-encoded partition value as combinedStats builds it: min = max =
    * the canonical value, nulls = 0, rows = 1 PLACEHOLDER — exact claims
    * about every row except `rows`. */
  private def pseudoStat(p: Long): (String, ColStats) =
    P -> ColStats(Stats.canonical(p), Stats.canonical(p), 0L, 1L)

  private val twoColFilterGen: Gen[Filter] = filterGen(2, Gen.oneOf(C, P))

  property("mixed real/pseudo stats: mustMatch still means EVERY row matches") =
    forAll(rowsGen, valueGen, twoColFilterGen) { (rows, p, f) =>
      val cs = statsOf(rows) + pseudoStat(p)
      !GraftSourceTable.mustMatch(stPart, cs, f) ||
        rows.forall(v => matches(Map(C -> v, P -> Some(p)), f))
    }

  property("mixed real/pseudo stats: !mayMatch still means NO row matches") =
    forAll(rowsGen, valueGen, twoColFilterGen) { (rows, p, f) =>
      val cs = statsOf(rows) + pseudoStat(p)
      GraftSourceTable.mayMatch(stPart, cs, f) ||
        rows.forall(v => !matches(Map(C -> v, P -> Some(p)), f))
    }

  property("mixed maps: the empty-file proof is deterministic regardless of map order") =
    forAll(valueGen, twoColFilterGen) { (p, f) =>
      // both insertion orders of {real rows=0, pseudo rows=1} must prove
      val a = statsOf(Nil) + pseudoStat(p)
      val b = Map(pseudoStat(p)) ++ statsOf(Nil)
      GraftSourceTable.mustMatch(stPart, a, f) &&
        GraftSourceTable.mustMatch(stPart, b, f)
    }

  property("exact point stats are decisive for equality predicates") =
    forAll(valueGen, Gen.choose(1, 5)) { (v, n) =>
      // a file holding n copies of exactly v: EqualTo(v) must prove,
      // EqualTo(v+1) must skip
      val rows = List.fill(n)(Some(v))
      val cs = statsOf(rows)
      GraftSourceTable.mustMatch(st, cs, EqualTo(C, v)) &&
        !GraftSourceTable.mayMatch(st, cs, EqualTo(C, v + 100))
    }
}
