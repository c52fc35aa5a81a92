package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.{SqlFunctions => FN}

/** The cross-database function surface (SURVEY §2.3) exercised per macro
  * against the driver's tables, mirroring the reference's golden-corpus
  * pattern (tests/functional/adapter/utils/fixture_*.py): every macro
  * family appears in at least one checked column.
  */
object FnQueries {

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // dateadd / date_trunc / last_day (incl. non-month parts)
    "q_fn_dates" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        FN.dateadd("day", 3, col("o_orderdate")).as("plus_3d"),
        FN.dateadd("month", 2, col("o_orderdate")).as("plus_2m"),
        FN.dateadd("hour", -5, col("o_orderdate")).as("minus_5h"),
        FN.dateTrunc("month", col("o_orderdate")).as("month_start"),
        FN.dateTrunc("quarter", col("o_orderdate")).as("quarter_start"),
        FN.lastDay("month", col("o_orderdate")).as("month_end"),
        FN.lastDay("quarter", col("o_orderdate")).as("quarter_end"))
        .orderBy("o_orderkey")
    }),

    // datediff across all parts (engine semantics documented in SqlFunctions)
    "q_fn_datediff" -> ((s, d) => {
      val anchor = lit("1998-01-01 00:00:00").cast(TimestampType)
      Tables.orders(s, d).select(
        col("o_orderkey"),
        FN.datediff("day", col("o_orderdate"), anchor).as("dd_day"),
        FN.datediff("week", col("o_orderdate"), anchor).as("dd_week"),
        FN.datediff("month", col("o_orderdate"), anchor).as("dd_month"),
        FN.datediff("quarter", col("o_orderdate"), anchor).as("dd_quarter"),
        FN.datediff("year", col("o_orderdate"), anchor).as("dd_year"),
        FN.datediff("hour", col("o_orderdate"), anchor).as("dd_hour"))
        .orderBy("o_orderkey")
    }),

    // concat/length/position/replace/right/split_part (+negative index)
    "q_fn_strings" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        FN.concatFields(col("p_brand"), lit("#"), col("p_type")).as("branded"),
        FN.lengthOf(col("p_name")).as("name_len"),
        FN.position(lit("a"), col("p_name")).as("first_a"),
        FN.replaceAll(col("p_name"), lit(" "), lit("_")).as("snake"),
        FN.rightChars(col("p_name"), lit(4)).as("last4"),
        FN.splitPart(col("p_name"), " ", 1).as("first_word"),
        FN.splitPart(col("p_name"), " ", -1).as("last_word"))
        .orderBy("p_partkey")
    }),

    // hash / surrogate key / safe_cast / cast_bool_to_text / null-safe equals
    "q_fn_hash_cast" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        FN.hashMd5(col("c_name")).as("name_md5"),
        FN.hashRow(Seq(col("c_custkey"), col("c_mktsegment"))).as("surrogate_key"),
        FN.safeCast(col("c_name"), IntegerType).as("bad_cast"),
        FN.safeCast(col("c_custkey").cast(StringType), LongType).as("good_cast"),
        FN.castBoolToText(col("c_acctbal") > 0).as("positive_text"),
        FN.equalsNullSafe(nullif(col("c_mktsegment"), lit("BUILDING")), lit(null).cast(StringType))
          .as("is_building_null_safe"))
        .orderBy("c_custkey")
    }),

    // listagg variants + any_value + bool_or per group
    "q_fn_agg" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_regionkey"))
        .agg(
          FN.listagg(col("n_name"), ",", col("n_name")).as("nations_ordered"),
          FN.listagg(col("n_name"), ",", col("n_name"), limit = 3).as("nations_top3"),
          FN.listaggDistinct(col("r_name"), ",").as("region_distinct"),
          FN.anyValue(col("r_name")).as("region_any"), // single-valued per group → deterministic
          FN.boolOr(col("n_name").startsWith("A")).as("has_a_nation"),
          count(lit(1)).as("n_nations"))
        .orderBy("r_regionkey")
    }),

    // array_construct/append/concat (+ element_at/size), emitted as strings
    // so the hash compare is representation-stable across engines
    "q_fn_arrays" -> ((s, d) => {
      val base = Tables.part(s, d).select(
        col("p_partkey"),
        FN.arrayConstruct(col("p_size"), col("p_size") * 2).as("arr"))
      base.select(
        col("p_partkey"),
        array_join(col("arr"), ",").as("arr_str"),
        array_join(FN.arrayAppend(col("arr"), col("p_partkey").cast(IntegerType)), ",").as("appended"),
        array_join(FN.arrayConcat(col("arr"), col("arr")), ",").as("doubled"),
        element_at(col("arr"), 2).as("second"),
        size(col("arr")).as("arr_len"))
        .orderBy("p_partkey")
    }),

    // generate_series as a parallel native source (spark.range)
    "q_fn_generate_series" -> ((s, d) => {
      s.range(1, 1001).toDF("n")
        .select(col("n"), (col("n") * col("n")).as("n_sq"))
        .orderBy("n")
    }),

    // date_spine: sequence + explode replaces the recursive ladder
    "q_fn_date_spine" -> ((s, d) => {
      s.range(1).select(explode(FN.dateSpine("day",
        lit("1995-01-01").cast(TimestampType),
        lit("1995-03-01").cast(TimestampType))).as("spine_day"))
        .orderBy("spine_day")
    }),

    // except / intersect set operators
    "q_fn_setops" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val y1996 = o.filter(year(col("o_orderdate")) === 1996).select("o_orderkey")
      val h2 = o.filter(col("o_orderdate") >= lit("1996-07-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1997-01-01").cast(TimestampType)).select("o_orderkey")
      val ex = y1996.except(h2).withColumn("op", lit("except"))
      val in = y1996.intersect(h2).withColumn("op", lit("intersect"))
      ex.unionByName(in).orderBy("op", "o_orderkey")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_fn_dates" ->
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 3 DAY AS plus_3d,
        |  o_orderdate + INTERVAL 2 MONTH AS plus_2m,
        |  o_orderdate - INTERVAL 5 HOUR AS minus_5h,
        |  date_trunc('month', o_orderdate)::timestamp AS month_start,
        |  date_trunc('quarter', o_orderdate)::timestamp AS quarter_start,
        |  last_day(o_orderdate) AS month_end,
        |  CAST(date_trunc('quarter', o_orderdate) + INTERVAL 3 MONTH - INTERVAL 1 DAY AS DATE) AS quarter_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_fn_datediff" ->
      """SELECT o_orderkey,
        |  date_diff('day', o_orderdate, TIMESTAMP '1998-01-01') AS dd_day,
        |  CAST(floor(date_diff('day', o_orderdate, TIMESTAMP '1998-01-01') / 7) AS BIGINT) AS dd_week,
        |  date_diff('month', o_orderdate, TIMESTAMP '1998-01-01') AS dd_month,
        |  date_diff('quarter', o_orderdate, TIMESTAMP '1998-01-01') AS dd_quarter,
        |  date_diff('year', o_orderdate, TIMESTAMP '1998-01-01') AS dd_year,
        |  CAST(floor(epoch(TIMESTAMP '1998-01-01')/3600) - floor(epoch(o_orderdate)/3600) AS BIGINT) AS dd_hour
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_fn_strings" ->
      """SELECT p_partkey,
        |  p_brand || '#' || p_type AS branded,
        |  length(p_name) AS name_len,
        |  strpos(p_name, 'a') AS first_a,
        |  replace(p_name, ' ', '_') AS snake,
        |  right(p_name, 4) AS last4,
        |  split_part(p_name, ' ', 1) AS first_word,
        |  split_part(p_name, ' ', -1) AS last_word
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_fn_hash_cast" ->
      """SELECT c_custkey,
        |  md5(c_name) AS name_md5,
        |  md5(concat_ws('|', coalesce(CAST(c_custkey AS VARCHAR), '_null_'),
        |                     coalesce(c_mktsegment, '_null_'))) AS surrogate_key,
        |  TRY_CAST(c_name AS INT) AS bad_cast,
        |  TRY_CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS good_cast,
        |  CAST(c_acctbal > 0 AS VARCHAR) AS positive_text,
        |  nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL AS is_building_null_safe
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_fn_agg" ->
      """SELECT r_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations_ordered,
        |  array_to_string(list_slice(list(n_name ORDER BY n_name), 1, 3), ',') AS nations_top3,
        |  array_to_string(list_sort(list(DISTINCT r_name)), ',') AS region_distinct,
        |  any_value(r_name) AS region_any,
        |  bool_or(n_name LIKE 'A%') AS has_a_nation,
        |  COUNT(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_regionkey ORDER BY r_regionkey""".stripMargin,

    "q_fn_arrays" ->
      """SELECT p_partkey,
        |  p_size::VARCHAR || ',' || (p_size*2)::VARCHAR AS arr_str,
        |  p_size::VARCHAR || ',' || (p_size*2)::VARCHAR || ',' || p_partkey::VARCHAR AS appended,
        |  p_size::VARCHAR || ',' || (p_size*2)::VARCHAR || ',' ||
        |    p_size::VARCHAR || ',' || (p_size*2)::VARCHAR AS doubled,
        |  p_size*2 AS second,
        |  2 AS arr_len
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_fn_generate_series" ->
      """SELECT n, n*n AS n_sq FROM generate_series(1, 1000) t(n) ORDER BY n""",

    "q_fn_date_spine" ->
      """SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
        |  TIMESTAMP '1995-03-01' - INTERVAL 1 DAY, INTERVAL 1 DAY)) AS spine_day
        |ORDER BY spine_day""".stripMargin,

    "q_fn_setops" ->
      """WITH y1996 AS (SELECT o_orderkey FROM orders WHERE year(o_orderdate) = 1996),
        |h2 AS (SELECT o_orderkey FROM orders
        |       WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT o_orderkey, 'except' AS op FROM (SELECT * FROM y1996 EXCEPT SELECT * FROM h2)
        |UNION ALL
        |SELECT o_orderkey, 'intersect' AS op FROM (SELECT * FROM y1996 INTERSECT SELECT * FROM h2)
        |ORDER BY op, o_orderkey""".stripMargin
  )
}
