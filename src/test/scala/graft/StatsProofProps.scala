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
  * NULL). */
object StatsProofProps extends Properties("StatsProofs") {

  // these proofs gate DATA DELETION — buy more random coverage than the
  // default 100 cases (the Not-on-nulls 3VL bug fell inside the first 100)
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(2000)

  private val C = "c"

  // rows: longs with nulls mixed in
  private val rowsGen: Gen[List[Option[Long]]] =
    Gen.listOfN(8, Gen.oneOf(
      Gen.const(None),
      Gen.choose(-5L, 5L).map(Some(_)))).map(_.take(8))

  private val valueGen: Gen[Long] = Gen.choose(-6L, 6L)

  private def leafGen: Gen[Filter] = Gen.oneOf(
    valueGen.map(v => EqualTo(C, v)),
    valueGen.map(v => GreaterThan(C, v)),
    valueGen.map(v => GreaterThanOrEqual(C, v)),
    valueGen.map(v => LessThan(C, v)),
    valueGen.map(v => LessThanOrEqual(C, v)),
    Gen.listOfN(3, valueGen).map(vs => In(C, vs.toArray.map(_.asInstanceOf[Any]))),
    Gen.const(IsNull(C)),
    Gen.const(IsNotNull(C)))

  private def filterGen(depth: Int): Gen[Filter] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      4 -> leafGen,
      2 -> Gen.zip(filterGen(depth - 1), filterGen(depth - 1)).map { case (a, b) => And(a, b) },
      2 -> Gen.zip(filterGen(depth - 1), filterGen(depth - 1)).map { case (a, b) => Or(a, b) },
      1 -> filterGen(depth - 1).map(Not))

  /** SQL 3VL reference evaluation of one row. */
  private def eval3(v: Option[Long], f: Filter): Option[Boolean] = f match {
    case And(l, r) => (eval3(v, l), eval3(v, r)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true))            => Some(true)
      case _                                   => None
    }
    case Or(l, r) => (eval3(v, l), eval3(v, r)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false))        => Some(false)
      case _                                 => None
    }
    case Not(x)       => eval3(v, x).map(!_)
    case IsNull(_)    => Some(v.isEmpty)
    case IsNotNull(_) => Some(v.isDefined)
    case EqualTo(_, x)            => v.map(_ == x.asInstanceOf[Long])
    case GreaterThan(_, x)        => v.map(_ > x.asInstanceOf[Long])
    case GreaterThanOrEqual(_, x) => v.map(_ >= x.asInstanceOf[Long])
    case LessThan(_, x)           => v.map(_ < x.asInstanceOf[Long])
    case LessThanOrEqual(_, x)    => v.map(_ <= x.asInstanceOf[Long])
    case In(_, xs)    => v.map(row => xs.exists(_.asInstanceOf[Long] == row))
    case other        => throw new IllegalArgumentException(other.toString)
  }

  private def matches(v: Option[Long], f: Filter): Boolean =
    eval3(v, f).contains(true)

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
      !GraftSourceTable.mustMatch(st, cs, f) || rows.forall(matches(_, f))
    }

  property("!mayMatch never overclaims: a skip means NO row matches") =
    forAll(rowsGen, filterGen(2)) { (rows, f) =>
      val cs = statsOf(rows)
      GraftSourceTable.mayMatch(st, cs, f) || rows.forall(r => !matches(r, f))
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
