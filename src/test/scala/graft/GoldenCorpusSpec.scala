package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{SqlFunctions => FN}

/** Golden-corpus replay (SURVEY §5 implication (b)): the reference tests
  * every cross-db macro as input-seed → macro-model → expected-seed →
  * assert_equal (tests/functional/adapter/utils/base_utils.py + the
  * fixture_*.py corpus). Same pattern here: literal input rows → the
  * SqlFunctions combinator → literal expected rows → two-way exceptAll.
  */
class GoldenCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def assertEqual(actual: DataFrame, expected: DataFrame, clue: String): Unit = {
    val a = actual.exceptAll(expected).collect()
    val e = expected.exceptAll(actual).collect()
    assert(a.isEmpty && e.isEmpty,
      s"$clue: actual-only=${a.mkString(";")} expected-only=${e.mkString(";")}")
  }

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s)

  test("dateadd golden (fixture_dateadd.py shape: hour/day/month/year + null)") {
    val in = Seq(
      (Some(ts("2021-01-01 00:00:00")), 1, "day", Some(ts("2021-01-02 00:00:00"))),
      (Some(ts("2021-01-31 00:00:00")), 1, "month", Some(ts("2021-02-28 00:00:00"))),
      (Some(ts("2020-02-29 00:00:00")), 1, "year", Some(ts("2021-02-28 00:00:00"))),
      (Some(ts("2021-01-01 23:00:00")), 2, "hour", Some(ts("2021-01-02 01:00:00"))),
      (Option.empty[java.sql.Timestamp], 1, "day", Option.empty[java.sql.Timestamp]))
      .toDF("from_time", "interval_length", "datepart", "result")
    for (part <- Seq("day", "month", "year", "hour")) {
      val rows = in.filter($"datepart" === part)
      assertEqual(
        rows.select(FN.dateadd(part, col("interval_length"), col("from_time")).as("r")),
        rows.select(col("result").as("r")), s"dateadd $part")
    }
  }

  test("datediff golden (fixture_datediff.py shape: boundary crossings)") {
    val cases = Seq(
      (ts("2021-01-01 00:00:00"), ts("2021-01-02 00:00:00"), "day", 1L),
      (ts("2021-12-31 00:00:00"), ts("2022-01-01 00:00:00"), "year", 1L),
      (ts("2021-12-31 00:00:00"), ts("2022-01-01 00:00:00"), "month", 1L),
      (ts("2021-03-31 00:00:00"), ts("2021-04-01 00:00:00"), "quarter", 1L),
      (ts("2021-01-01 00:00:00"), ts("2021-01-15 00:00:00"), "week", 2L),
      (ts("2021-01-01 23:59:59"), ts("2021-01-02 00:00:01"), "hour", 1L))
    for ((a, b, part, want) <- cases) {
      val got = Seq((a, b)).toDF("a", "b")
        .select(FN.datediff(part, col("a"), col("b"))).collect()(0).getLong(0)
      assert(got == want, s"datediff $part($a,$b)")
    }
  }

  test("listagg golden (fixture_listagg.py variants: ordered, limited, distinct)") {
    val in = Seq((1, "a", 3), (1, "b", 1), (1, "c", 2), (2, "x", 1), (2, "x", 2))
      .toDF("group_col", "string_text", "order_col")
    val got = in.groupBy("group_col").agg(
      FN.listagg(col("string_text"), "_", col("order_col")).as("ordered"),
      FN.listagg(col("string_text"), "_", col("order_col"), limit = 2).as("limited"),
      FN.listaggDistinct(col("string_text"), "_").as("distinct"))
    assertEqual(got,
      Seq((1, "b_c_a", "b_c", "a_b_c"), (2, "x_x", "x_x", "x"))
        .toDF("group_col", "ordered", "limited", "distinct"),
      "listagg")
  }

  test("split_part golden incl. negative index (_split_part_negative)") {
    val in = Seq(("a|b|c", "|")).toDF("parts", "split_on")
    assertEqual(
      in.select(
        FN.splitPart(col("parts"), "|", 1).as("r1"),
        FN.splitPart(col("parts"), "|", 2).as("r2"),
        FN.splitPart(col("parts"), "|", -1).as("rneg")),
      Seq(("a", "b", "c")).toDF("r1", "r2", "rneg"), "split_part")
  }

  test("hash golden (fixture_hash.py: md5 incl. null → md5 of cast)") {
    val in = Seq(Some("ab"), Option.empty[String]).toDF("input_1")
    assertEqual(
      in.select(FN.hashMd5(col("input_1")).as("output")),
      Seq(Some("187ef4436122d1cc2f40dc2b92f0eba0"), Option.empty[String]).toDF("output"),
      "hash")
  }

  test("safe_cast / cast_bool_to_text / equals goldens") {
    val in = Seq(("3", true, Some("x"), Some("x")), ("notanint", false, None, Some("y")))
      .toDF("s", "b", "l", "r")
    assertEqual(
      in.select(
        FN.safeCast(col("s"), IntegerType).as("c"),
        FN.castBoolToText(col("b")).as("t"),
        FN.equalsNullSafe(col("l"), col("r")).as("e")),
      Seq((Some(3), "true", true), (None, "false", false)).toDF("c", "t", "e"),
      "safe_cast/bool/equals")
  }

  test("null_compare golden (fixture_null_compare.py shape: full 3VL matrix)") {
    // the reference's null-compare corpus: every (null?, null?) combination
    // through null-safe equals must produce a non-null boolean
    val in = Seq(
      (Some("a"), Some("a")), (Some("a"), Some("b")),
      (Some("a"), None), (None, Some("b")), (None, None))
      .toDF("l", "r")
    assertEqual(
      in.select(FN.equalsNullSafe(col("l"), col("r")).as("e")),
      Seq(true, false, false, false, true).toDF("e"),
      "null_compare")
  }

  test("portable type macros golden (data_types/test_type_*.py shape)") {
    // each type macro's DDL string must round-trip a representative value
    // through CAST unchanged (the reference seeds a column per type and
    // compares against an expected cast column)
    val in = Seq(("9223372036854775807", "true", "1.5", "42", "12.000001", "x",
      "2021-02-03 12:30:00")).toDF("bi", "bo", "fl", "it", "nu", "st", "tsv")
    val out = in.select(
      expr(s"cast(bi as ${FN.typeBigint})").as("bi"),
      expr(s"cast(bo as ${FN.typeBoolean})").as("bo"),
      expr(s"cast(fl as ${FN.typeFloat})").as("fl"),
      expr(s"cast(it as ${FN.typeInt})").as("it"),
      expr(s"cast(nu as ${FN.typeNumeric})").as("nu"),
      expr(s"cast(st as ${FN.typeString})").as("st"),
      expr(s"cast(tsv as ${FN.typeTimestamp})").as("tsv"))
    assert(out.schema.map(_.dataType.simpleString) ==
      Seq("bigint", "boolean", "double", "int", "decimal(28,6)", "string", "timestamp"))
    val r = out.collect()(0)
    assert(r.getLong(0) == Long.MaxValue && r.getBoolean(1) && r.getDouble(2) == 1.5)
    assert(r.getInt(3) == 42 && r.getDecimal(4).toPlainString == "12.000001")
    assert(r.getString(5) == "x" && r.getTimestamp(6) == ts("2021-02-03 12:30:00"))
  }

  test("last_day / date_trunc goldens (month + quarter)") {
    val in = Seq(ts("2021-02-03 12:30:00")).toDF("d")
    assertEqual(
      in.select(
        FN.lastDay("month", col("d")).as("lm"),
        FN.lastDay("quarter", col("d")).as("lq"),
        FN.dateTrunc("month", col("d")).as("tm")),
      Seq((java.sql.Date.valueOf("2021-02-28"), java.sql.Date.valueOf("2021-03-31"),
        ts("2021-02-01 00:00:00"))).toDF("lm", "lq", "tm"),
      "last_day/date_trunc")
  }

  test("concat / length / position / replace / right goldens") {
    val in = Seq(("abcdef", "cd")).toDF("s", "sub")
    assertEqual(
      in.select(
        FN.concatFields(col("s"), lit("-"), col("sub")).as("c"),
        FN.lengthOf(col("s")).as("l"),
        FN.position(col("sub"), col("s")).as("p"),
        FN.replaceAll(col("s"), col("sub"), lit("__")).as("r"),
        FN.rightChars(col("s"), lit(2)).as("rt")),
      Seq(("abcdef-cd", 6, 3, "ab__ef", "ef")).toDF("c", "l", "p", "r", "rt"),
      "strings")
  }

  test("date_spine golden: day spine over a month boundary, end-exclusive") {
    val days = spark.range(1).select(explode(FN.dateSpine("day",
      lit("2021-02-26").cast(TimestampType), lit("2021-03-02").cast(TimestampType))).as("d"))
      .collect().map(_.getTimestamp(0))
    assert(days.toSeq == Seq("2021-02-26", "2021-02-27", "2021-02-28", "2021-03-01")
      .map(s => ts(s + " 00:00:00")))
  }
}
