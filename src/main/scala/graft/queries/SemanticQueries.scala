package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core._
import graft.compile.TemplateResolver
import graft.quality.UnitTests
import graft.relations.RelationManager
import graft.runner.Commands
import graft.semantic.Metrics

/** Semantic-layer metrics (SURVEY §2.7), unit-test execution (§2.1), and
  * the clone command (§2.8) demonstrated through the correctness gate.
  */
object SemanticQueries {

  private def ordersModel(s: SparkSession, d: String): Metrics.SemanticModel =
    Metrics.SemanticModel(
      base = Tables.orders(s, d),
      timeDimension = Some("order_month" -> date_trunc("month", col("o_orderdate"))),
      dimensions = Map("status" -> col("o_orderstatus")),
      measures = Seq(
        Metrics.Measure("revenue", col("o_totalprice"), Metrics.Sum),
        Metrics.Measure("n_orders", lit(1), Metrics.Count),
        Metrics.Measure("max_price", col("o_totalprice"), Metrics.Max)))

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // simple + ratio metrics at (month, status) grain — one shuffle total
    "q_metric_simple_ratio" -> ((s, d) => {
      Metrics.query(ordersModel(s, d),
        Seq(
          Metrics.Simple("revenue", "revenue"),
          Metrics.Simple("n_orders", "n_orders"),
          Metrics.Simple("max_price", "max_price"),
          Metrics.Ratio("avg_order_value", "revenue", "n_orders")),
        grain = Seq("status"))
        .orderBy("order_month", "status")
    }),

    // declarable derived metric: arithmetic expression over sibling
    // measures, compiled by Metrics.derived (identifiers → measure
    // aggregates, literals/operators pass through to Spark SQL)
    "q_metric_derived" -> ((s, d) => {
      Metrics.query(ordersModel(s, d),
        Seq(
          Metrics.Simple("revenue", "revenue"),
          Metrics.derived("rev_per_order_x100", "revenue / n_orders * 100 + 1",
            Set("revenue", "n_orders", "max_price"))),
        grain = Seq("status"))
        .orderBy("order_month", "status")
    }),

    // the same derived metric declared AS DATA in a project (reference:
    // v1/metric.py:14-20 DerivedTypeParams — metrics are manifest
    // resources, not API calls): semantics/*.conf declares the measures +
    // derived expression, saved_queries/*.conf requests it with a table
    // export, and the full parse → manifest → runner → export pipeline
    // materializes it. Gate reads the exported table.
    "q_metric_derived_declared" -> ((s, d) => {
      val dir = Files.createTempDirectory("graft_msem")
      def put(rel: String, content: String): Unit = {
        val p = dir.resolve(rel)
        Files.createDirectories(p.getParent)
        Files.writeString(p, content)
      }
      put("graft_project.conf",
        s"""name = sem
           |schema = main
           |sources.tpch = $d
           |""".stripMargin)
      put("models/orders_base.sql",
        "select o_orderkey, o_orderstatus, o_totalprice, o_orderdate from {{ source('tpch','orders') }}")
      put("semantics/orders_sem.conf",
        """model: orders_base
          |time_dimension: order_month: date_trunc('month', o_orderdate)
          |dimension: status: o_orderstatus
          |measure: revenue: sum: o_totalprice
          |measure: n_orders: count: 1
          |metric: revenue: simple: revenue
          |metric: rev_per_order_x100: derived: revenue / n_orders * 100 + 1
          |""".stripMargin)
      put("saved_queries/monthly_derived.conf",
        """semantic_model: orders_sem
          |metrics: revenue|rev_per_order_x100
          |grain: status
          |export: monthly_derived_tbl: table
          |""".stripMargin)
      val sw = new java.io.StringWriter()
      val rc = graft.Main.execute(s,
        graft.Main.Args(command = "build", project = dir.toString),
        new java.io.PrintWriter(sw, true))
      require(rc == 0, s"declared-metric build failed:\n$sw")
      val rm = new RelationManager(s, s"$dir/target/warehouse")
      rm.read(Relation("graft", "main", "monthly_derived_tbl"))
        .orderBy("order_month", "status")
    }),

    // cumulative (running) revenue per status over months
    "q_metric_cumulative" -> ((s, d) => {
      Metrics.query(ordersModel(s, d),
        Seq(
          Metrics.Simple("revenue", "revenue"),
          Metrics.Cumulative("revenue_to_date", "revenue"),
          Metrics.Cumulative("revenue_trailing_3m", "revenue", trailing = Some(3))),
        grain = Seq("status"))
        .orderBy("order_month", "status")
    }),

    // conversion metric: users converting view → purchase within 7 days
    "q_metric_conversion" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Metrics.conversion(
        base = ev.filter(col("event_type") === "view"),
        conv = ev.filter(col("event_type") === "purchase"),
        entity = "user_id", baseTime = "ts", convTime = "ts", windowDays = 7)
    }),

    // unit-test executor: fixture-injected model run + diff, both outcomes
    "q_unit_test" -> ((s, d) => {
      import s.implicits._
      val model = TemplateResolver.parseModel("demo", "revenue_by_seg",
        """select segment, sum(amount) as revenue
          |from {{ ref('payments') }} group by segment""".stripMargin)
      val fixtures = Seq(UnitTests.Fixture("payments", Seq(
        Map("segment" -> "gold", "amount" -> 10L),
        Map("segment" -> "gold", "amount" -> 5L),
        Map("segment" -> "silver", "amount" -> 7L))))
      val pass = UnitTests.run(s, UnitTests.UnitTest("ut_pass", model, fixtures,
        expect = Seq(Map("segment" -> "gold", "revenue" -> 15L),
          Map("segment" -> "silver", "revenue" -> 7L))))
      val fail = UnitTests.run(s, UnitTests.UnitTest("ut_fail", model, fixtures,
        expect = Seq(Map("segment" -> "gold", "revenue" -> 999L))))
      Seq(
        (pass.name, pass.status, pass.actualOnly.size, pass.expectedOnly.size),
        (fail.name, fail.status, fail.actualOnly.size, fail.expectedOnly.size))
        .toDF("test_name", "status", "n_actual_only", "n_expected_only")
        .orderBy("test_name")
    }),

    // saved_query + export: compile once, materialize as a table export,
    // read the export back (reference: v1/saved_query.py:34-96)
    "q_saved_query_export" -> ((s, d) => {
      val rm = new RelationManager(s, Files.createTempDirectory("graft_sq").toString)
      val sq = graft.semantic.SavedQueries.SavedQuery(
        name = "monthly_status_revenue",
        model = ordersModel(s, d),
        metrics = Seq(
          Metrics.Simple("revenue", "revenue"),
          Metrics.Simple("n_orders", "n_orders")),
        grain = Seq("status"),
        where = Some(col("n_orders") > 10),
        exports = Seq(graft.semantic.SavedQueries.Export("monthly_status_revenue_tbl")))
      val rels = graft.semantic.SavedQueries.run(rm, "main", sq)
      rm.read(rels("monthly_status_revenue_tbl")).orderBy("order_month", "status")
    }),

    // clone: state warehouse → target warehouse (deep copy), read back
    "q_cmd_clone" -> ((s, d) => {
      val state = new RelationManager(s, Files.createTempDirectory("graft_state").toString)
      val target = new RelationManager(s, Files.createTempDirectory("graft_target").toString)
      val rel = Relation("graft", "main", "nation_clone")
      state.writeTable(Tables.nation(s, d), rel)
      Commands.clone(state, target, rel, deep = true)
      target.read(rel).orderBy("n_nationkey")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_metric_simple_ratio" ->
      """SELECT date_trunc('month', o_orderdate)::timestamp AS order_month,
        |  o_orderstatus AS status,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders,
        |  MAX(o_totalprice) AS max_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_order_value
        |FROM orders GROUP BY 1, 2 ORDER BY order_month, status""".stripMargin,

    "q_metric_derived" ->
      """SELECT date_trunc('month', o_orderdate)::timestamp AS order_month,
        |  o_orderstatus AS status,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    / COUNT(*) * 100 + 1 AS rev_per_order_x100
        |FROM orders GROUP BY 1, 2 ORDER BY order_month, status""".stripMargin,

    // identical relational semantics to q_metric_derived — the declared
    // path must produce the same bytes as the API path
    "q_metric_derived_declared" ->
      """SELECT date_trunc('month', o_orderdate)::timestamp AS order_month,
        |  o_orderstatus AS status,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    / COUNT(*) * 100 + 1 AS rev_per_order_x100
        |FROM orders GROUP BY 1, 2 ORDER BY order_month, status""".stripMargin,

    "q_metric_cumulative" ->
      """WITH m AS (
        |  SELECT date_trunc('month', o_orderdate)::timestamp AS order_month,
        |    o_orderstatus AS status,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1, 2)
        |SELECT order_month, status, revenue,
        |  CAST(SUM(CAST(revenue AS DECIMAL(18,4))) OVER (
        |    PARTITION BY status ORDER BY order_month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS revenue_to_date,
        |  CAST(SUM(CAST(revenue AS DECIMAL(18,4))) OVER (
        |    PARTITION BY status ORDER BY order_month
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS revenue_trailing_3m
        |FROM m ORDER BY order_month, status""".stripMargin,

    "q_saved_query_export" ->
      """WITH m AS (
        |  SELECT date_trunc('month', o_orderdate)::timestamp AS order_month,
        |    o_orderstatus AS status,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1, 2)
        |SELECT order_month, status, revenue, n_orders FROM m
        |WHERE n_orders > 10 ORDER BY order_month, status""".stripMargin,

    "q_metric_conversion" ->
      """WITH b AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        |per_user AS (
        |  SELECT b.user_id,
        |    max(CASE WHEN c.ts IS NOT NULL AND c.ts >= b.ts
        |              AND c.ts <= b.ts + INTERVAL 7 DAY THEN 1 ELSE 0 END) AS any_conversion
        |  FROM b LEFT JOIN c ON b.user_id = c.user_id
        |  GROUP BY b.user_id)
        |SELECT COUNT(*) AS n_entities,
        |  CAST(SUM(any_conversion) AS BIGINT) AS n_converted,
        |  CAST(SUM(any_conversion) * 1.0 / COUNT(*) AS DOUBLE) AS conversion_rate
        |FROM per_user""".stripMargin,

    "q_unit_test" ->
      """SELECT * FROM (VALUES
        |  ('ut_fail', 'fail', 2, 1),
        |  ('ut_pass', 'pass', 0, 0))
        |AS t(test_name, status, n_actual_only, n_expected_only)
        |ORDER BY test_name""".stripMargin,

    "q_cmd_clone" ->
      "SELECT * FROM nation ORDER BY n_nationkey"
  )
}
