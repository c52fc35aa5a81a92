package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality operators (SURVEY §2.2) — the reference's generic tests
  * (manifest.json §macro.dbt.default__test_unique / test_not_null /
  * test_accepted_values / test_relationships) plus the test
  * materialization wrapper (§materialization_test_default,
  * §default__get_test_sql; executor core/dbt/task/test.py:142-330).
  *
  * Each test returns the DataFrame of FAILING rows; the wrapper reduces it
  * to the reference's one-row (failures, should_warn, should_error) shape.
  */
object GenericTests {

  /** unique — keys occurring more than once
    * (select col, count(*) ... having count(*) > 1). */
  def unique(model: DataFrame, column: String): DataFrame =
    model.filter(col(column).isNotNull)
      .groupBy(col(column).as("unique_field"))
      .agg(count(lit(1)).as("n_records"))
      .filter(col("n_records") > 1)

  /** Multi-column uniqueness (dbt_utils.unique_combination_of_columns). */
  def uniqueCombination(model: DataFrame, columns: Seq[String]): DataFrame =
    model.groupBy(columns.map(col): _*)
      .agg(count(lit(1)).as("n_records"))
      .filter(col("n_records") > 1)

  /** not_null — rows where the column is null. */
  def notNull(model: DataFrame, column: String): DataFrame =
    model.filter(col(column).isNull)

  /** accepted_values — distinct values outside the allowed list. */
  def acceptedValues(model: DataFrame, column: String, values: Seq[Any]): DataFrame =
    model.groupBy(col(column).as("value_field"))
      .agg(count(lit(1)).as("n_records"))
      .filter(!col("value_field").isin(values: _*))

  /** relationships — child keys with no parent (referential integrity);
    * anti join keeps it a single shuffle (or broadcast when parent is small). */
  def relationships(child: DataFrame, childKey: String,
                    parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .select(col(childKey).as("from_field"))

  // ------------------------------------------------------------- wrapper

  /** Test severity evaluation config (reference:
    * core/dbt/parser/generic_test_builders.py:85-94). `warnIf`/`errorIf`
    * are SQL comparison fragments applied to the failure count, e.g.
    * "!= 0", "> 10". */
  final case class TestConfig(
      where: Option[Column] = None,
      limit: Option[Int] = None,
      severity: String = "error",
      warnIf: String = "!= 0",
      errorIf: String = "!= 0",
      failCalc: String = "count(*)")

  final case class TestResult(failures: Long, shouldWarn: Boolean, shouldError: Boolean) {
    def status: String =
      if (shouldError) "fail" else if (shouldWarn) "warn" else "pass"
  }

  /** The reference's test SQL wrapper as a DataFrame reduction:
    * select fail_calc as failures, failures {warn_if}, failures {error_if}
    * from (main_sql [where] [limit]). Returns the one-row result frame
    * with the reference's exact column names plus the driver-side verdict. */
  def wrap(failing: DataFrame, cfg: TestConfig = TestConfig()): (DataFrame, TestResult) = {
    val filtered = cfg.where.map(failing.filter).getOrElse(failing)
    val limited = cfg.limit.map(filtered.limit).getOrElse(filtered)
    val counted = limited.agg(expr(cfg.failCalc).cast("long").as("failures"))
      .select(
        col("failures"),
        expr(s"failures ${cfg.warnIf}").as("should_warn"),
        expr(s"failures ${cfg.errorIf}").as("should_error"))
    val row = counted.collect()(0)
    val res = TestResult(
      failures = if (row.isNullAt(0)) 0L else row.getLong(0),
      shouldWarn = !row.isNullAt(1) && row.getBoolean(1),
      shouldError = !row.isNullAt(2) && row.getBoolean(2))
    (counted, res)
  }

  /** store_failures: persist failing rows under the test schema
    * (reference: core/dbt/task/test.py store_failures handling). */
  def storeFailures(rm: graft.relations.RelationManager,
                    rel: graft.core.Relation, failing: DataFrame): Unit =
    rm.writeTable(failing, rel)

  // -------------------------------------------- custom generic tests

  /** Custom generic-test registry (reference: any macro named
    * `test_<name>(model, column_name, …)` discovered from tests/generic/,
    * core/dbt/parser/schema_generic_tests.py + generic_test_builders.py:29-57):
    * a named (DataFrame, column, args) → failing-rows function that schema
    * tests can reference by name. Ships with the dbt-utils-style extras. */
  object TestRegistry {
    type GenericTest = (DataFrame, String, Map[String, String]) => DataFrame
    private val tests = scala.collection.concurrent.TrieMap.empty[String, GenericTest]

    def register(name: String)(fn: GenericTest): Unit = tests.put(name, fn)
    def apply(name: String): GenericTest = tests.getOrElse(name,
      throw new NoSuchElementException(s"unknown generic test '$name'"))
    def names: Seq[String] = tests.keys.toSeq.sorted

    // built-ins, addressable by name like the reference's test_ macros
    register("unique")((df, c, _) => unique(df, c))
    register("not_null")((df, c, _) => notNull(df, c))
    register("accepted_values")((df, c, args) =>
      acceptedValues(df, c, args.getOrElse("values", "").split("\\|").toSeq))
    // dbt-utils-style extras
    register("positive_values")((df, c, _) => df.filter(col(c) <= 0))
    register("not_empty_string")((df, c, _) =>
      df.filter(col(c).isNotNull && length(trim(col(c))) === 0))
    register("accepted_range")((df, c, args) => {
      val lo = args.get("min").map(_.toDouble)
      val hi = args.get("max").map(_.toDouble)
      df.filter(
        lo.map(v => col(c) < v).getOrElse(lit(false)) ||
          hi.map(v => col(c) > v).getOrElse(lit(false)))
    })
  }

  // ------------------------------------ project-file generic tests (r9)

  /** A generic test defined as a PROJECT FILE, not a Scala registry entry
    * (reference: SQL files under `tests/generic/` holding `{% test <name>(model,
    * column_name[, kwarg=default...]) %} SELECT … {% endtest %}` macros —
    * core/dbt/parser/schema_generic_tests.py, the last authoring-parity
    * gap from the r8 verdict). The SELECT names the FAILING rows, like
    * every generic test here.
    *
    * Template surface (deliberately tiny, like TemplateResolver):
    * `{{ model }}` → the tested relation, `{{ column_name }}` → the
    * declared column, `{{ <kwarg> }}` → the schema-test argument of that
    * name (signature defaults apply; a referenced kwarg with no value and
    * no default fails loudly at run time). The `{% test %}` wrapper is
    * optional — a bare SELECT file takes its name from the filename's
    * `test_` stem. */
  private val TestBlockRe =
    raw"(?s)\{%\s*test\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(([^)]*)\)\s*%\}(.*?)\{%\s*endtest\s*%\}".r
  private val PlaceholderRe = raw"\{\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*\}\}".r

  /** Parse one tests/generic file → (testName, kwargDefaults, body). */
  private[graft] def parseSqlTestFile(fileStem: String, content: String)
    : (String, Map[String, String], String) =
    TestBlockRe.findFirstMatchIn(content) match {
      case Some(m) =>
        val defaults = m.group(2).split(",").iterator.map(_.trim).filter(_.nonEmpty)
          .flatMap { p =>
            p.split("=", 2) match {
              case Array(k, v) => Some(k.trim -> v.trim.stripPrefix("'").stripSuffix("'"))
              case _ => None // positional params (model, column_name)
            }
          }.toMap
        (m.group(1), defaults, m.group(3).trim)
      case None =>
        require(fileStem.startsWith("test_"),
          s"generic test file '$fileStem.sql' must be named test_<name>.sql " +
            "or contain a {% test <name>(...) %} block")
        (fileStem.stripPrefix("test_"), Map.empty, content.trim)
    }

  private[graft] def renderSqlTest(body: String, model: String, column: String,
                                   args: Map[String, String]): String =
    PlaceholderRe.replaceAllIn(body, m =>
      java.util.regex.Matcher.quoteReplacement(m.group(1) match {
        case "model" => model
        case "column_name" => column
        case key => args.getOrElse(key, throw new IllegalArgumentException(
          s"generic test references {{ $key }} but the test declaration " +
            s"passes no '$key=' and the signature declares no default"))
      }))

  /** Register a file-defined generic test under the same registry the
    * Scala-defined tests use — schema declarations reference it by name
    * exactly like a built-in. The tested frame is exposed to the SQL via
    * a transient temp view; Spark analyzes eagerly, so the view is
    * dropped as soon as the failing-rows frame is built.
    *
    * Name collisions OVERRIDE, deliberately: in the reference a project
    * macro named `test_unique` shadows the global built-in through
    * macro-dispatch precedence (core/dbt/context/macros.py), so a
    * project redefining a built-in here behaves the same. The registry
    * is session-global, like the reference's macro namespace — two
    * projects loaded in one session share it (last definition wins),
    * which is also the reference's behavior for identically-named
    * package macros. */
  def registerSqlTest(fileStem: String, content: String): String = {
    val (name, defaults, body) = parseSqlTestFile(fileStem, content)
    TestRegistry.register(name) { (df, column, args) =>
      val spark = df.sparkSession
      val view = s"__graft_generic_${name}_${java.lang.Long.toHexString(System.nanoTime())}"
      df.createOrReplaceTempView(view)
      try spark.sql(renderSqlTest(body, view, column, defaults ++ args))
      finally spark.catalog.dropTempView(view)
    }
    name
  }

  // --------------------------------------------------- source freshness

  /** Source freshness (reference: core/dbt/task/freshness.py:83-177;
    * thresholds core/dbt/artifacts/resources/v1/components.py:117-149):
    * age = now - max(loaded_at); thresholds in seconds. */
  final case class Freshness(maxLoadedAt: java.sql.Timestamp, ageSeconds: Double, status: String)

  def sourceFreshness(df: DataFrame, loadedAtField: String,
                      warnAfterSec: Long, errorAfterSec: Long,
                      now: java.time.Instant = java.time.Instant.now()): Freshness = {
    val maxLoaded = df.agg(max(col(loadedAtField)).cast("timestamp")).collect()(0)
      .getTimestamp(0)
    if (maxLoaded == null) {
      // empty source: infinitely stale, not an NPE
      Freshness(null, Double.PositiveInfinity, "error")
    } else {
      val age = (now.toEpochMilli - maxLoaded.getTime) / 1000.0
      val status =
        if (errorAfterSec > 0 && age > errorAfterSec) "error"
        else if (warnAfterSec > 0 && age > warnAfterSec) "warn"
        else "pass"
      Freshness(maxLoaded, age, status)
    }
  }
}
