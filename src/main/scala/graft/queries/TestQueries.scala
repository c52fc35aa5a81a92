package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.Relation
import graft.quality.GenericTests
import graft.relations.RelationManager

/** Data-quality operators (SURVEY §2.2) run through the real GenericTests
  * machinery against the driver's tables; each query returns the failing
  * rows (or the reference's one-row wrapper shape) so correctness of the
  * operator itself is oracle-checked.
  */
object TestQueries {

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // unique — l_orderkey repeats per line number → failing keys with counts
    "q_test_unique" -> ((s, d) => {
      GenericTests.unique(Tables.lineitem(s, d), "l_orderkey")
        .orderBy("unique_field")
    }),

    // unique over a combination (passes → empty result, still checked)
    "q_test_unique_combo" -> ((s, d) => {
      GenericTests.uniqueCombination(Tables.lineitem(s, d), Seq("l_orderkey", "l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // not_null on a derived nullable column (base data has no nulls)
    "q_test_not_null" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("maybe_null", nullif(col("event_type"), lit("error")))
      GenericTests.notNull(ev, "maybe_null")
        .select("event_id", "event_type")
        .orderBy("event_id")
    }),

    // accepted_values — 'P' falls outside the accepted list
    "q_test_accepted_values" -> ((s, d) => {
      GenericTests.acceptedValues(Tables.orders(s, d), "o_orderstatus", Seq("O", "F"))
        .orderBy("value_field")
    }),

    // relationships — referential integrity vs a thinned parent
    "q_test_relationships" -> ((s, d) => {
      val parent = Tables.part(s, d).filter(col("p_partkey") % 2 === 0)
      GenericTests.relationships(Tables.lineitem(s, d), "l_partkey", parent, "p_partkey")
        .orderBy("from_field")
    }),

    // the reference's test wrapper: one row (failures, should_warn, should_error)
    "q_test_wrapper" -> ((s, d) => {
      val parent = Tables.part(s, d).filter(col("p_partkey") % 2 === 0)
      val failing = GenericTests.relationships(Tables.lineitem(s, d), "l_partkey", parent, "p_partkey")
      val (counted, _) = GenericTests.wrap(failing, GenericTests.TestConfig(
        warnIf = "> 100", errorIf = "> 1000000"))
      counted
    }),

    // store_failures — failing rows persisted under the test schema and read back
    "q_test_store_failures" -> ((s, d) => {
      val rm = new RelationManager(s, Files.createTempDirectory("graft_tf").toString)
      val failing = GenericTests.acceptedValues(Tables.orders(s, d), "o_orderstatus", Seq("O", "F"))
      val rel = Relation("graft", "test_failures", "accepted_values_o_orderstatus")
      GenericTests.storeFailures(rm, rel, failing)
      rm.read(rel).orderBy("value_field")
    }),

    // r9: a generic test DEFINED AS A PROJECT SQL FILE ({% test %} macro
    // with a kwarg default), registered and dispatched through the same
    // TestRegistry path Project.load uses for tests/generic/ files
    "q_test_custom_sql_file" -> ((s, d) => {
      GenericTests.registerSqlTest("test_value_at_most",
        """{% test value_at_most(model, column_name, ceiling='100000') %}
          |select o_orderkey, {{ column_name }} as value_field
          |from {{ model }} where {{ column_name }} > {{ ceiling }}
          |{% endtest %}""".stripMargin)
      GenericTests.TestRegistry("value_at_most")(
        Tables.orders(s, d), "o_totalprice", Map("ceiling" -> "400000"))
        .orderBy("o_orderkey")
    }),

    // source freshness with an injected clock (deterministic)
    "q_test_source_freshness" -> ((s, d) => {
      import s.implicits._
      val now = java.time.Instant.parse("2026-01-01T00:00:00Z")
      val f = GenericTests.sourceFreshness(Tables.events(s, d), "ts",
        warnAfterSec = 3600, errorAfterSec = 7 * 24 * 3600, now = now)
      Seq((f.maxLoadedAt, f.status)).toDF("max_loaded_at", "status")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_test_unique" ->
      """SELECT l_orderkey AS unique_field, COUNT(*) AS n_records
        |FROM lineitem WHERE l_orderkey IS NOT NULL
        |GROUP BY l_orderkey HAVING COUNT(*) > 1
        |ORDER BY unique_field""".stripMargin,

    "q_test_unique_combo" ->
      """SELECT l_orderkey, l_linenumber, COUNT(*) AS n_records
        |FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) > 1
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_test_not_null" ->
      """SELECT event_id, event_type FROM events
        |WHERE nullif(event_type, 'error') IS NULL
        |ORDER BY event_id""".stripMargin,

    "q_test_accepted_values" ->
      """SELECT o_orderstatus AS value_field, COUNT(*) AS n_records
        |FROM orders GROUP BY 1
        |HAVING o_orderstatus NOT IN ('O', 'F')
        |ORDER BY value_field""".stripMargin,

    "q_test_relationships" ->
      """SELECT l_partkey AS from_field FROM lineitem
        |WHERE l_partkey IS NOT NULL
        |  AND l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey % 2 = 0)
        |ORDER BY from_field""".stripMargin,

    "q_test_wrapper" ->
      """SELECT COUNT(*) AS failures,
        |  COUNT(*) > 100 AS should_warn,
        |  COUNT(*) > 1000000 AS should_error
        |FROM lineitem
        |WHERE l_partkey IS NOT NULL
        |  AND l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey % 2 = 0)""".stripMargin,

    "q_test_store_failures" ->
      """SELECT o_orderstatus AS value_field, COUNT(*) AS n_records
        |FROM orders GROUP BY 1
        |HAVING o_orderstatus NOT IN ('O', 'F')
        |ORDER BY value_field""".stripMargin,

    "q_test_custom_sql_file" ->
      """SELECT o_orderkey, o_totalprice AS value_field
        |FROM orders WHERE o_totalprice > 400000
        |ORDER BY o_orderkey""".stripMargin,

    "q_test_source_freshness" ->
      """SELECT CAST(max(ts) AS TIMESTAMP) AS max_loaded_at,
        |  CASE
        |    WHEN date_diff('second', CAST(max(ts) AS TIMESTAMP), TIMESTAMP '2026-01-01') > 7*24*3600 THEN 'error'
        |    WHEN date_diff('second', CAST(max(ts) AS TIMESTAMP), TIMESTAMP '2026-01-01') > 3600 THEN 'warn'
        |    ELSE 'pass' END AS status
        |FROM events""".stripMargin
  )
}
