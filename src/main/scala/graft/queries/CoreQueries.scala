package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Core relational coverage: scan→filter→agg, multi-way joins with
  * broadcast dims, window functions, event-time aggregation.
  *
  * Determinism contract with the DuckDB oracle (SURVEY §7.4 risk 6):
  * money aggregates go through exact decimal sums
  * (`sum(cast(x as decimal(18,4)))`) and only then to double, so the
  * result bits are identical regardless of partition/accumulation order
  * in either engine; every query ends in an explicit orderBy mirrored in
  * the oracle SQL.
  */
object CoreQueries {

  /** Exact-sum helper: order-insensitive, engine-portable aggregate. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped pricing summary. Scale: single hash-aggregate with
    // map-side partial agg over a pruned 7-column scan; shipdate filter is
    // pushed to parquet (PushedFilters in explain).
    "q1_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          (sum(col("l_quantity").cast(DecimalType(18, 4))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // 5-way star join rolled up to region/nation revenue. Scale: all four
    // dims are broadcast (Tables.broadcastable) so the only shuffle is the
    // aggregation; lineitem never re-partitions by a join key.
    //
    // r18 optimization round (guide §2.3 "aggregate before you shuffle"):
    // lineitem pre-aggregates per order BELOW the joins — partial decimal
    // sums are exact and associative, so revenue bits are unchanged, and
    // after the orderkey rollup each surviving order appears exactly once
    // per group (o_orderkey is orders' key; the dims join on their own
    // unique keys), so COUNT(*) ≡ COUNT(DISTINCT o_orderkey) and the
    // 3-level distinct aggregate disappears. Joins then probe ~4× fewer
    // rows. Same oracle, measured 2.26 → 1.56 s at sf0.1.
    "q2_revenue_by_nation" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = broadcast(Tables.customer(s, d))
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      li.groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))).as("__rev"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(col("__rev")).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Window functions: top-3 orders per customer with deterministic
    // tiebreak, plus running revenue. One shuffle on o_custkey serves both
    // window specs (same partitioning).
    "q3_top_orders_per_customer" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("run_total",
          sum(col("o_totalprice").cast(DecimalType(18, 4))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          col("o_totalprice"), col("run_total"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Event-time daily rollup — the batch shape of the streaming windowed
    // aggregation (graft.streaming); partition pruning on event-time comes
    // free when data is date-partitioned at scale.
    "q4_events_daily" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("day"), col("event_type"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q3_top_orders_per_customer" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice, run_total FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q4_events_daily" ->
      """SELECT date_trunc('day', ts) AS day, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin
  )
}
