package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Column, DataFrame}
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

  test("listagg golden: the reference's full 7-variant corpus (fixture_listagg.py:16-32)") {
    // exact seed rows from seeds__data_listagg_csv
    val in = Seq(
      (1, "a", 1), (1, "b", 2), (1, "c", 3),
      (2, "a", 2), (2, "1", 1), (2, "p", 3),
      (3, "g", 1), (3, "g", 2), (3, "g", 3))
      .toDF("group_col", "string_text", "order_col")
    val g3 = in.filter($"group_col" === 3)
    def agg(df: DataFrame, version: String, c: Column): DataFrame =
      df.groupBy("group_col").agg(c.as("actual")).withColumn("version", lit(version))
    val got =
      agg(in, "bottom_ordered", FN.listagg(col("string_text"), "_|_", col("order_col")))
        .unionByName(agg(in, "bottom_ordered_limited",
          FN.listagg(col("string_text"), "_|_", col("order_col"), limit = 2)))
        .unionByName(agg(g3, "comma_whitespace_unordered",
          FN.listagg(col("string_text"), ", ", col("string_text"))))
        .unionByName(agg(g3, "distinct_comma", FN.listaggDistinct(col("string_text"), ",")))
        .unionByName(agg(g3, "no_params", FN.listagg(col("string_text"), ",", col("string_text"))))
        .unionByName(agg(in, "top_ordered",
          FN.listagg(col("string_text"), "_|_", col("order_col"), descending = true)))
        .unionByName(agg(in, "top_ordered_limited",
          FN.listagg(col("string_text"), "_|_", col("order_col"), limit = 2, descending = true)))
    // exact expected rows from seeds__data_listagg_output_csv
    val expected = Seq(
      (1, "a_|_b_|_c", "bottom_ordered"), (2, "1_|_a_|_p", "bottom_ordered"),
      (3, "g_|_g_|_g", "bottom_ordered"),
      (1, "a_|_b", "bottom_ordered_limited"), (2, "1_|_a", "bottom_ordered_limited"),
      (3, "g_|_g", "bottom_ordered_limited"),
      (3, "g, g, g", "comma_whitespace_unordered"),
      (3, "g", "distinct_comma"),
      (3, "g,g,g", "no_params"),
      (1, "c_|_b_|_a", "top_ordered"), (2, "p_|_a_|_1", "top_ordered"),
      (3, "g_|_g_|_g", "top_ordered"),
      (1, "c_|_b", "top_ordered_limited"), (2, "p_|_a", "top_ordered_limited"),
      (3, "g_|_g", "top_ordered_limited"))
      .toDF("group_col", "actual", "version")
    assertEqual(got, expected, "listagg 7-variant corpus")
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

  test("position / replace / right golden: edge matrix (data_position/replace/right seeds)") {
    // the reference seeds exercise the boundary rows the single happy-path
    // row above skips: not-found (position → 0), needle-absent replace
    // (unchanged), replace-to-empty (delete), n=0 / n>length right, and
    // NULL propagation on every function
    val in = Seq(
      ("abcdef", "xyz"),  // absent needle
      ("abcdef", "abcdef"), // needle == haystack
      ("aaa", "a"),       // repeated matches
      (null, "a"),        // null haystack
      ("abc", null)       // null needle
    ).toDF("s", "sub")
    assertEqual(
      in.select(
        FN.position(col("sub"), col("s")).as("p"),
        FN.replaceAll(col("s"), col("sub"), lit("")).as("gone"),
        FN.replaceAll(col("s"), col("sub"), lit("Z")).as("z")),
      Seq[(Integer, String, String)](
        (0, "abcdef", "abcdef"),
        (1, "", "Z"),
        (1, "", "ZZZ"),
        (null, null, null),
        (null, null, null)).toDF("p", "gone", "z"),
      "position/replace edges")
    val r = Seq(("abcdef")).toDF("s")
    assertEqual(
      r.select(
        FN.rightChars(col("s"), lit(0)).as("r0"),
        FN.rightChars(col("s"), lit(6)).as("r6"),
        FN.rightChars(col("s"), lit(99)).as("rBig"),
        FN.rightChars(lit(null).cast("string"), lit(2)).as("rNull")),
      Seq[(String, String, String, String)](("", "abcdef", "abcdef", null))
        .toDF("r0", "r6", "rBig", "rNull"),
      "right edges")
  }

  test("numeric(28,6) golden: scale rounding and precision headroom (data_types numeric)") {
    // the reference's numeric seed is DECIMAL(28,6): casts must round to
    // 6 fractional digits (HALF_UP) and carry 22 integer digits unscathed
    val in = Seq(
      ("12.0000014", "12.000001"),
      ("12.0000015", "12.000002"),
      ("-12.0000015", "-12.000002"),
      ("9999999999999999999999.999999", "9999999999999999999999.999999"),
      ("0.0000001", "0.000000")
    ).toDF("input", "expected")
    val out = in.select(
      expr(s"cast(input as ${FN.typeNumeric})").as("n"), col("expected"))
    assert(out.schema.head.dataType.simpleString == "decimal(28,6)")
    out.collect().foreach { r =>
      assert(r.getDecimal(0).toPlainString == r.getString(1),
        s"${r.getDecimal(0)} != expected ${r.getString(1)}")
    }
  }

  test("concat golden: empty-string matrix (fixture_concat.py, dbt-core issue 4725)") {
    // the reference's seed uses EMPTY placeholders replaced by '' — concat
    // of empty strings must not null out or drop the other operand
    val in = Seq(("a", "b", "ab"), ("a", "", "a"), ("", "b", "b"), ("", "", ""))
      .toDF("input_1", "input_2", "output")
    assertEqual(
      in.select(FN.concatFields(col("input_1"), col("input_2")).as("r")),
      in.select(col("output").as("r")),
      "concat empty-string matrix")
  }

  test("date_spine golden: day spine over a month boundary, end-exclusive") {
    val days = spark.range(1).select(explode(FN.dateSpine("day",
      lit("2021-02-26").cast(TimestampType), lit("2021-03-02").cast(TimestampType))).as("d"))
      .collect().map(_.getTimestamp(0))
    assert(days.toSeq == Seq("2021-02-26", "2021-02-27", "2021-02-28", "2021-03-01")
      .map(s => ts(s + " 00:00:00")))
  }

  test("date_spine golden: the reference's exact fixture range (fixture_date_spine.py: 9 days, no nulls)") {
    val days = spark.range(1).select(explode(FN.dateSpine("day",
      lit("2023-09-01").cast(TimestampType), lit("2023-09-10").cast(TimestampType))).as("d"))
      .collect().map(_.getTimestamp(0))
    assert(days.length == 9 && days.forall(_ != null))
    assert(days.toSeq == (1 to 9).map(i => ts(f"2023-09-0$i%s 00:00:00")))
    // degenerate ranges: empty (start == end) and single-day — the
    // sequence() descending gotcha (NOTES.md) must not resurface
    val empty = spark.range(1).select(FN.dateSpine("day",
      lit("2023-09-01").cast(TimestampType), lit("2023-09-01").cast(TimestampType)).as("a"))
      .collect()(0).getSeq[Any](0)
    assert(empty.isEmpty, s"start==end spine must be empty, got $empty")
    val one = spark.range(1).select(explode(FN.dateSpine("day",
      lit("2023-09-01").cast(TimestampType), lit("2023-09-02").cast(TimestampType))).as("d"))
      .collect().map(_.getTimestamp(0))
    assert(one.toSeq == Seq(ts("2023-09-01 00:00:00")))
  }

  test("array golden: construct/append/concat incl. empty typed arrays (fixture_array_*.py)") {
    // fixture_array_append.py: append to [1,2,3] and to the empty array
    assertEqual(
      spark.range(1).select(
        FN.arrayAppend(FN.arrayConstruct(lit(1), lit(2), lit(3)), lit(4)).as("a1"),
        FN.arrayAppend(FN.emptyArray(IntegerType), lit(4)).as("a2")),
      spark.range(1).select(
        FN.arrayConstruct(lit(1), lit(2), lit(3), lit(4)).as("a1"),
        FN.arrayConstruct(lit(4)).as("a2")),
      "array_append")
    // fixture_array_concat.py: both-sides, empty-left, empty-right
    assertEqual(
      spark.range(1).select(
        FN.arrayConcat(FN.arrayConstruct(lit(1), lit(2), lit(3)),
          FN.arrayConstruct(lit(4), lit(5), lit(6))).as("c1"),
        FN.arrayConcat(FN.emptyArray(IntegerType), FN.arrayConstruct(lit(2))).as("c2"),
        FN.arrayConcat(FN.arrayConstruct(lit(3)), FN.emptyArray(IntegerType)).as("c3")),
      spark.range(1).select(
        FN.arrayConstruct(lit(1), lit(2), lit(3), lit(4), lit(5), lit(6)).as("c1"),
        FN.arrayConstruct(lit(2)).as("c2"),
        FN.arrayConstruct(lit(3)).as("c3")),
      "array_concat")
    // fixture_array_construct.py: the empty construct keeps its element type
    val empties = spark.range(1).select(
      FN.emptyArray(IntegerType).as("i"), FN.emptyArray(StringType).as("s"))
    assert(empties.schema("i").dataType == ArrayType(IntegerType))
    assert(empties.schema("s").dataType == ArrayType(StringType))
    assert(empties.collect()(0).getSeq[Any](0).isEmpty)
  }
}
