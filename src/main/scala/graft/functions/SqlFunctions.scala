package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The cross-database SQL function surface of the reference (SURVEY §2.3):
  * dbt's dispatchable macro library (manifest.json §macro.dbt.default__*,
  * golden tests under tests/functional/adapter/utils/) re-expressed as
  * Spark `Column` combinators.
  *
  * Everything here stays inside Catalyst built-ins → whole-stage codegen;
  * no UDFs, so the functions are pushdown- and pruning-transparent at any
  * scale.
  */
object SqlFunctions {

  // ---------- date/time (reference: manifest.json §macro.dbt.default__dateadd /
  // datediff / date_trunc / last_day; tests/functional/adapter/utils/fixture_dateadd.py) ----------

  /** dateadd(part, n, ts) — n may be a column. Native TimestampAdd. */
  def dateadd(part: String, n: Column, ts: Column): Column =
    timestamp_add(part.toUpperCase, n, ts)
  def dateadd(part: String, n: Int, ts: Column): Column = dateadd(part, lit(n), ts)

  /** datediff(part, a, b) = boundary crossings from a to b (warehouse/dbt
    * semantics for year/quarter/month/day, matching DuckDB date_diff).
    * week/hour/minute/second are epoch-bucket differences (documented engine
    * semantics; oracles mirror the same formula). */
  def datediff(part: String, a: Column, b: Column): Column = part.toLowerCase match {
    case "year"    => (year(b) - year(a)).cast(LongType)
    case "quarter" => ((year(b) - year(a)) * 4 + (quarter(b) - quarter(a))).cast(LongType)
    case "month"   => ((year(b) - year(a)) * 12 + (month(b) - month(a))).cast(LongType)
    case "day"     => date_diff(to_date(b), to_date(a)).cast(LongType)
    case "week"    => floor(date_diff(to_date(b), to_date(a)) / 7).cast(LongType)
    case "hour"    => floor(unix_timestamp(b) / 3600) - floor(unix_timestamp(a) / 3600)
    case "minute"  => floor(unix_timestamp(b) / 60) - floor(unix_timestamp(a) / 60)
    case "second"  => unix_timestamp(b) - unix_timestamp(a)
    case p         => throw new IllegalArgumentException(s"bad datepart $p")
  }

  /** date_trunc(part, ts) — native. */
  def dateTrunc(part: String, ts: Column): Column = date_trunc(part, ts)

  /** last_day(part, d) — reference default__last_day =
    * dateadd(part,1,date_trunc(part,d)) - 1 day; month has a native form. */
  def lastDay(part: String, d: Column): Column = part.toLowerCase match {
    case "month" => last_day(d)
    case _       => to_date(dateadd("day", lit(-1), dateadd(part, lit(1), date_trunc(part, d))))
  }

  /** date_spine(part, start, end) — exclusive end, like dbt's date_spine.
    * `sequence` replaces the reference's recursive generate_series ladder
    * (manifest.json §macro.dbt.default__date_spine). */
  def dateSpine(part: String, start: Column, end: Column): Column = {
    val step = part.toLowerCase match {
      case "year" | "month" | "week" | "day" | "hour" =>
        expr(s"interval 1 ${part.toLowerCase}")
      case p => throw new IllegalArgumentException(s"bad datepart $p")
    }
    filter(sequence(start, end, step), x => x < end)
  }

  // ---------- series (reference: §default__generate_series — powers-of-two
  // cross-join ladder; Spark: spark.range is a parallel native source) ----------

  /** In-row 1..n series; for table-valued use spark.range(1, n+1). */
  def generateSeries(n: Column): Column = sequence(lit(1L), n.cast(LongType))

  // ---------- strings (§default__concat/length/position/replace/right/split_part) ----------

  def concatFields(cols: Column*): Column = concat(cols: _*)
  def lengthOf(c: Column): Column = length(c)
  /** position(substring in string), 1-based, 0 if absent. */
  def position(substr: Column, inStr: Column): Column = call_function("locate", substr, inStr)
  def replaceAll(c: Column, from: Column, to: Column): Column = call_function("replace", c, from, to)
  def rightChars(c: Column, n: Column): Column = call_function("right", c, n)
  /** split_part with 1-based index; negative index counts from the end
    * (reference: manifest.json §macro.dbt._split_part_negative). */
  def splitPart(c: Column, delim: String, idx: Int): Column =
    element_at(split(c, java.util.regex.Pattern.quote(delim)), idx)
  def escapeSingleQuotes(s: String): String = s.replace("'", "''")
  def stringLiteral(s: String): String = s"'${escapeSingleQuotes(s)}'"

  // ---------- hash / cast (§default__hash, §default__safe_cast, §cast_bool_to_text) ----------

  def hashMd5(c: Column): Column = md5(c.cast(StringType))
  /** Multi-column row hash, dbt surrogate-key style: md5 of '|'-joined
    * string casts with null sentinel. */
  def hashRow(cols: Seq[Column]): Column =
    md5(concat_ws("|", cols.map(c => coalesce(c.cast(StringType), lit("_null_"))): _*))
  def safeCast(c: Column, t: DataType): Column = c.try_cast(t)
  def castBoolToText(c: Column): Column = c.cast(StringType)

  // ---------- aggregates (§default__listagg / any_value / bool_or) ----------

  /** listagg(measure, delimiter, orderBy, limit) — ordered, optionally
    * limited group concat. Reference fixture covers 6 variants
    * (tests/functional/adapter/utils/fixture_listagg.py).
    * sort_array(collect_list(struct(...))) keeps it a single partial-merge
    * hash aggregate — no window, no extra shuffle; same bounded-group
    * contract as warehouse listagg. */
  def listagg(measure: Column, delimiter: String, orderBy: Column, limit: Int = -1,
              descending: Boolean = false): Column = {
    // struct comparison is lexicographic (order key first), so one
    // sort_array covers both directions — `order by o desc` is the
    // reference's top_ordered listagg variant (fixture_listagg.py)
    val sorted = sort_array(collect_list(struct(orderBy.as("o"), measure.as("m"))),
      asc = !descending)
    val limited = if (limit > 0) slice(sorted, 1, limit) else sorted
    array_join(transform(limited, s => s.getField("m").cast(StringType)), delimiter)
  }

  /** listagg distinct, deterministic (sorted by value). */
  def listaggDistinct(measure: Column, delimiter: String): Column =
    array_join(array_sort(collect_set(measure.cast(StringType))), delimiter)

  def anyValue(c: Column): Column = any_value(c)
  def boolOr(c: Column): Column = bool_or(c)

  // ---------- arrays (§default__array_construct/append/concat) ----------

  def arrayConstruct(vals: Column*): Column = array(vals: _*)
  def emptyArray(t: DataType): Column = array().cast(ArrayType(t))
  def arrayAppend(a: Column, e: Column): Column = array_append(a, e)
  def arrayConcat(a: Column, b: Column): Column = concat(a, b)

  // ---------- bool (§default__equals — null-safe equality) ----------

  def equalsNullSafe(a: Column, b: Column): Column = a <=> b

  // ---------- time (§current_timestamp; session TZ forced to UTC) ----------

  def currentTimestampUtc(): Column = current_timestamp()

  // ---------- meta (§validate_sql, §get_columns_in_query) ----------

  /** validate_sql — analyze without executing (reference:
    * tests/functional/adapter/utils/test_validate_sql.py). Returns an error
    * message or None. */
  def validateSql(spark: org.apache.spark.sql.SparkSession, sql: String): Option[String] =
    try { spark.sql(sql).queryExecution.analyzed; None }
    catch { case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName)) }

  /** get_columns_in_query / get_column_schema_from_query — schema probe via
    * analysis only, the Spark-native form of the reference's
    * `select ... limit 0` empty-schema probe (§get_empty_subquery_sql). */
  def columnsInQuery(spark: org.apache.spark.sql.SparkSession, sql: String): StructType =
    spark.sql(sql).schema

  // ---------- compile-time series helpers (§get_intervals_between, §get_powers_of_two) ----------

  /** Driver-side interval count between two dates (the reference runs a
    * datediff statement at compile time). */
  def intervalsBetween(start: java.time.LocalDate, end: java.time.LocalDate, part: String): Long =
    part.toLowerCase match {
      case "day"   => java.time.temporal.ChronoUnit.DAYS.between(start, end)
      case "week"  => java.time.temporal.ChronoUnit.DAYS.between(start, end) / 7
      case "month" => java.time.temporal.ChronoUnit.MONTHS.between(start, end)
      case "year"  => java.time.temporal.ChronoUnit.YEARS.between(start, end)
      case p       => throw new IllegalArgumentException(s"bad datepart $p")
    }

  /** Smallest n with 2^n >= x (reference: pure Jinja math). */
  def powersOfTwo(x: Long): Int = {
    require(x > 0)
    64 - java.lang.Long.numberOfLeadingZeros(x - 1)
  }

  // ---------- type macros (§type_bigint/boolean/float/int/numeric/string/timestamp) ----------

  /** Portable type-name macros → Spark DDL strings (SURVEY §1.2). */
  val typeBigint = "BIGINT"
  val typeBoolean = "BOOLEAN"
  val typeFloat = "DOUBLE"
  val typeInt = "INT"
  val typeNumeric = "DECIMAL(28,6)"
  val typeString = "STRING"
  val typeTimestamp = "TIMESTAMP"
}
