package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.core._
import graft.compile.TemplateResolver
import graft.materializations.{Materializations, Microbatch, Snapshot}
import graft.relations.RelationManager
import graft.runner.Runner

/** Materialization operators (SURVEY §2.1) demonstrated end-to-end on the
  * driver's tables: each query executes the real materialization machinery
  * into a scratch warehouse and returns the final table contents; the
  * oracle reproduces the expected relational semantics in plain SQL.
  */
object MatQueries {

  private def scratch(s: SparkSession): RelationManager =
    new RelationManager(s, Files.createTempDirectory("graft_q_wh").toString)

  private val D = "1997-01-01" // split point for incremental scenarios

  /** Stale target state: pre-D orders with a sentinel priority (what an
    * out-of-date incremental table would hold). */
  private def staleTarget(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") < lit(D).cast(TimestampType))
      .withColumn("o_orderpriority", lit("STALE"))

  /** The new batch: everything from 1996 onward (overlaps the stale rows
    * of 1996, introduces post-D keys). */
  private def newBatch(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType))

  private val mergedOracle =
    s"""WITH target AS (
       |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       |         'STALE' AS o_orderpriority
       |  FROM orders WHERE o_orderdate < TIMESTAMP '$D'),
       |source AS (
       |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01')
       |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
       |FROM source
       |UNION ALL
       |SELECT t.* FROM target t WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM source)
       |ORDER BY o_orderkey""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------ view/table/ephemeral/seed
    // through the full parse → manifest → DAG → scheduler → materialization
    // pipeline (the SURVEY §7.2 slice on real data).
    "q_mat_pipeline" -> ((s, d) => {
      val rm = scratch(s)
      Tables.names.foreach(n => Tables.load(s, d, n).createOrReplaceTempView(s"tpch_$n"))
      val nodes = Seq(
        TemplateResolver.parseModel("demo", "stg_lineitem",
          "select l_orderkey, l_quantity, l_extendedprice, l_discount from {{ source('tpch','lineitem') }}"),
        TemplateResolver.parseModel("demo", "big_lines",
          "{{ config(materialized='ephemeral') }}\nselect * from {{ ref('stg_lineitem') }} where l_quantity > 45"),
        TemplateResolver.parseModel("demo", "mart_orders",
          """{{ config(materialized='table') }}
            |select l_orderkey,
            |  count(*) as n_big_lines,
            |  cast(sum(cast(l_extendedprice as decimal(18,4))) as double) as gross
            |from {{ ref('big_lines') }} group by l_orderkey""".stripMargin))
      val manifest = Manifest(nodes).processRefs()
      val runner = new Runner(s, rm, manifest, threads = 2)
      val results = runner.run()
      require(results.forall(r => r.status == "success"), results.mkString(";"))
      rm.read(Relation("graft", "main", "mart_orders")).orderBy("l_orderkey")
    }),

    // ------------------------------------- materialized_view (refresh skip)
    // the SECOND build must be a provable no-op: the refresh fingerprint
    // (input commit-log versions + compiled-SQL hash) is unchanged, so the
    // gate verifies BOTH the result and the freshness semantics
    "q_mat_materialized_view" -> ((s, d) => {
      val rm = scratch(s)
      Tables.names.foreach(n => Tables.load(s, d, n).createOrReplaceTempView(s"tpch_$n"))
      val nodes = Seq(
        TemplateResolver.parseModel("demo", "nation_base",
          "{{ config(materialized='table') }}\nselect n_nationkey, n_name, n_regionkey from {{ source('tpch','nation') }}"),
        TemplateResolver.parseModel("demo", "mv_region_counts",
          """{{ config(materialized='materialized_view') }}
            |select n_regionkey, count(*) as n_nations, min(n_name) as first_name
            |from {{ ref('nation_base') }} group by n_regionkey""".stripMargin))
      val manifest = Manifest(nodes).processRefs()
      val r1 = new Runner(s, rm, manifest).run()
      require(r1.forall(_.status == "success"), r1.mkString(";"))
      val r2 = new Runner(s, rm, manifest).run(select = Seq("mv_region_counts"))
      require(r2.exists(r => r.uniqueId.endsWith("mv_region_counts") &&
        r.message.startsWith("fresh")), r2.mkString(";"))
      rm.read(Relation("graft", "main", "mv_region_counts")).orderBy("n_regionkey")
    }),

    // ------------------------------------------------ seed (typed CSV load)
    "q_mat_seed" -> ((s, d) => {
      val rm = scratch(s)
      val rel = Relation("graft", "main", "seed_demo")
      Materializations.seed(rm, rel,
        """id,region_name,active,score
          |1,emea,true,1.5
          |2,amer,false,2.5
          |3,apac,true,3.75""".stripMargin,
        columnTypes = Map("score" -> "double", "id" -> "bigint"))
      rm.read(rel).orderBy("id")
    }),

    // ------------------------------------------------ incremental strategies
    "q_mat_incremental_merge" -> ((s, d) => {
      val rm = scratch(s)
      val rel = Relation("graft", "main", "orders_merge")
      rm.writeTable(staleTarget(s, d), rel)
      Materializations.mergeInto(rm, rel, newBatch(s, d), Seq("o_orderkey"), updateColumns = Nil)
      rm.read(rel).orderBy("o_orderkey")
    }),

    "q_mat_incremental_delete_insert" -> ((s, d) => {
      val rm = scratch(s)
      val rel = Relation("graft", "main", "orders_di")
      rm.writeTable(staleTarget(s, d), rel)
      Materializations.deleteInsert(rm, rel, newBatch(s, d), Seq("o_orderkey"))
      rm.read(rel).orderBy("o_orderkey")
    }),

    "q_mat_incremental_append" -> ((s, d) => {
      val rm = scratch(s)
      val rel = Relation("graft", "main", "orders_app")
      val pre = Tables.orders(s, d).filter(col("o_orderdate") < lit(D).cast(TimestampType))
      val post = Tables.orders(s, d).filter(col("o_orderdate") >= lit(D).cast(TimestampType))
      rm.writeTable(pre, rel)
      Materializations.incremental(rm, rel, _ => post,
        NodeConfig(materialized = "incremental", incrementalStrategy = Some("append")))
      rm.read(rel).orderBy("o_orderkey")
    }),

    "q_mat_insert_overwrite" -> ((s, d) => {
      val rm = scratch(s)
      val rel = Relation("graft", "main", "orders_po")
      val withMonth = (df: DataFrame) =>
        df.withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      // target: all months, flagged OLD
      rm.writeTable(withMonth(Tables.orders(s, d)).withColumn("o_orderpriority", lit("OLD")),
        rel, partitionBy = Seq("o_month"))
      // batch: 1996 months only, flagged NEW → only those partitions replaced
      val batch = withMonth(Tables.orders(s, d)
        .filter(year(col("o_orderdate")) === 1996))
        .withColumn("o_orderpriority", lit("NEW"))
      rm.overwritePartitions(batch, rel, Seq("o_month"))
      rm.read(rel)
        .select("o_orderkey", "o_orderpriority", "o_month")
        .orderBy("o_orderkey")
    }),

    // ------------------------------------------------ microbatch
    "q_mat_microbatch" -> ((s, d) => {
      val rm = scratch(s)
      val rel = Relation("graft", "main", "events_mb")
      val ev = Tables.events(s, d)
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some("microbatch"),
        eventTime = Some("day"), batchSize = Some("day"),
        begin = Some(java.time.Instant.parse("2024-01-01T00:00:00Z")))
      // run end = exclusive max day+1 so every event is covered
      val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
      val end = Microbatch.offset(maxTs.toInstant, Microbatch.Day, 1)
      def build(b: (java.time.Instant, java.time.Instant)): DataFrame =
        ev.withColumn("day", date_trunc("day", col("ts")))
          .filter(Microbatch.eventTimeFilter("day", b))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
      Microbatch.run(rm, rel, build, cfg, end)
      rm.read(rel).select("day", "n_events", "sum_value").orderBy("day")
    }),

    // ------------------------------------------------ snapshots (SCD-2)
    "q_mat_snapshot_timestamp" -> ((s, d) => {
      val rm = scratch(s)
      val rel = Relation("graft", "snapshots", "orders_snap")
      val base = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").as("updated_at"))
      val v1 = base.filter(col("updated_at") < lit(D).cast(TimestampType))
      // v2: every 7th key gets a newer version with doubled price
      val changed = col("o_orderkey") % 7 === 0
      val v2 = base
        .withColumn("o_totalprice", when(changed, col("o_totalprice") * 2).otherwise(col("o_totalprice")))
        .withColumn("updated_at", when(changed,
          col("updated_at") + expr("interval 100 days")).otherwise(col("updated_at")))
      val strat = Snapshot.TimestampStrategy("updated_at")
      Snapshot(rm, rel, v1, Seq("o_orderkey"), strat)
      Snapshot(rm, rel, v2, Seq("o_orderkey"), strat)
      rm.read(rel)
        .select("o_orderkey", "o_totalprice", "dbt_valid_from", "dbt_valid_to")
        .orderBy("o_orderkey", "dbt_valid_from")
    }),

    "q_mat_snapshot_check" -> ((s, d) => {
      val rm = scratch(s)
      val rel = Relation("graft", "snapshots", "cust_check_snap")
      val base = Tables.customer(s, d).select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val at1 = java.time.Instant.parse("2024-01-01T00:00:00Z")
      val at2 = java.time.Instant.parse("2024-06-01T00:00:00Z")
      // v2: every 5th customer moves segment
      val v2 = base.withColumn("c_mktsegment",
        when(col("c_custkey") % 5 === 0, lit("MOVED")).otherwise(col("c_mktsegment")))
      Snapshot(rm, rel, base, Seq("c_custkey"), Snapshot.CheckStrategy(at1), checkCols = Seq("all"))
      Snapshot(rm, rel, v2, Seq("c_custkey"), Snapshot.CheckStrategy(at2), checkCols = Seq("all"))
      rm.read(rel)
        .select("c_custkey", "c_mktsegment", "dbt_valid_from", "dbt_valid_to")
        .orderBy("c_custkey", "dbt_valid_from")
    }),

    // ------------------------------------------------- bucketed tables (r4)
    // Two co-bucketed commit-log tables joined on their bucket key: the
    // manifest's bucket layout makes this a storage-partitioned join
    // (no exchange — BucketingSpec asserts the plan), and the oracle
    // confirms the bucket routing loses no rows.
    "q_mat_bucketed_join" -> ((s, d) => {
      val rm = scratch(s)
      val relO = Relation("graft", "main", "orders_bkt")
      val relL = Relation("graft", "main", "lineitem_bkt")
      rm.writeBucketedTable(Tables.orders(s, d), relO, 8, Seq("o_orderkey"))
      rm.writeBucketedTable(
        Tables.lineitem(s, d).withColumnRenamed("l_orderkey", "o_orderkey"),
        relL, 8, Seq("o_orderkey"))
      rm.read(relO).join(rm.read(relL), "o_orderkey")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderkey")
    }),

    // r12: OPTIMIZE ZORDER roundtrip — a Morton rewrite on (o_custkey,
    // o_totalprice) must move bytes, never rows: the post-rewrite read
    // equals the source relationally, while ZorderSpec separately proves
    // the multi-column file pruning the rewrite exists for. Filtered
    // through BOTH clustered columns so a stats-pruning bug (wrongly
    // dropped file) surfaces as missing rows here, not just in specs.
    "q_mat_zorder" -> ((s, d) => {
      val rm = scratch(s)
      val rel = Relation("graft", "main", "orders_z")
      rm.writeTable(Tables.orders(s, d), rel,
        statsCols = Seq("o_custkey", "o_totalprice"))
      rm.optimize(rel, clusterBy = Seq("o_custkey", "o_totalprice"),
        targetFileBytes = 64L * 1024, zorder = true)
      rm.read(rel)
        .filter(col("o_custkey") % 10 === 3 && col("o_totalprice") > 50000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // ------------------------------------------------- V2 write surface (r4)
    // A graft table written by the ENGINE, appended to by plain Spark SQL
    // (INSERT INTO through the V2 catalog — any Spark job can do this), then
    // partition-trimmed by a metadata-only DELETE that drops whole manifest
    // entries without touching data bytes. The oracle reproduces the final
    // row set relationally.
    "q_v2_sql_write" -> ((s, d) => {
      val rm = scratch(s)
      val rel = Relation("graft", "main", "orders_v2w")
      val base = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).as("o_year"), col("o_orderdate"))
      rm.writeTable(
        base.filter(col("o_orderdate") < lit(D).cast(TimestampType)).drop("o_orderdate"),
        rel, partitionBy = Seq("o_year"), statsCols = Seq("o_orderkey"))
      Tables.orders(s, d).createOrReplaceTempView("tpch_orders_v2w")
      val t = s"${rm.catalogName}.main.orders_v2w"
      s.sql(
        s"""INSERT INTO $t
           |SELECT o_orderkey, o_totalprice, year(o_orderdate)
           |FROM tpch_orders_v2w WHERE o_orderdate >= TIMESTAMP '$D'""".stripMargin)
      s.sql(s"DELETE FROM $t WHERE o_year = 1992")
      s.sql(s"SELECT o_orderkey, o_totalprice, o_year FROM $t ORDER BY o_orderkey")
    }),

    // SQL row-level DML (copy-on-write): UPDATE flags a 1% key stripe,
    // DELETE removes another — both predicates are unprovable at file
    // granularity, so they exercise the group-based rewrite (runtime
    // `_file` group filter → replace only affected files), not the
    // metadata-delete shortcut.
    "q_v2_dml" -> ((s, d) => {
      val rm = scratch(s)
      val rel = Relation("graft", "main", "orders_dml")
      rm.writeTable(
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
          .repartitionByRange(8, col("o_orderkey")),
        rel, statsCols = Seq("o_orderkey"))
      val t = s"${rm.catalogName}.main.orders_dml"
      s.sql(s"UPDATE $t SET o_orderpriority = 'DML' WHERE o_orderkey % 100 = 0")
      s.sql(s"DELETE FROM $t WHERE o_orderkey % 100 = 7")
      s.sql(s"SELECT o_orderkey, o_totalprice, o_orderpriority FROM $t ORDER BY o_orderkey")
    }),

    // SQL row-level DML (merge-on-read): same mutations through positional
    // delete files — no data file is rewritten; the read side anti-merges
    // dead positions and the second UPDATE mutates a RE-INSERTED row
    // (delete entries on a file written by the previous delta commit).
    "q_mor_dml" -> ((s, d) => {
      val rm = scratch(s)
      val rel = Relation("graft", "main", "orders_mor")
      rm.writeTable(
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
          .repartitionByRange(8, col("o_orderkey")),
        rel, statsCols = Seq("o_orderkey"))
      rm.setTableProperties(rel, Map("row_level_mode" -> "merge-on-read"))
      val t = s"${rm.catalogName}.main.orders_mor"
      s.sql(s"UPDATE $t SET o_orderpriority = 'MOR' WHERE o_orderkey % 100 = 0")
      s.sql(s"DELETE FROM $t WHERE o_orderkey % 100 = 7")
      s.sql(s"UPDATE $t SET o_orderpriority = 'MOR2' WHERE o_orderkey % 200 = 0")
      s.sql(s"SELECT o_orderkey, o_totalprice, o_orderpriority FROM $t ORDER BY o_orderkey")
    }),

    // round-6: stored change images under merge-on-read — the connector
    // feed over a MoR DML interval, diff-free (images written at commit
    // time; GraftChangeImages). Commit numbers are normalized to a dense
    // sequence so the oracle does not depend on setup-commit count.
    "q_mor_change_feed" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val rm = scratch(s)
      val rel = Relation("graft", "main", "orders_mor_cdf")
      rm.writeTable(
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
          .repartitionByRange(8, col("o_orderkey")),
        rel, statsCols = Seq("o_orderkey"))
      rm.setTableProperties(rel, Map(
        "row_level_mode" -> "merge-on-read", "change_feed" -> "true",
        // determinism at any scale factor: no auto-fold commits mid-feed
        "delete_compaction" -> "false"))
      val v0 = rm.currentVersion(rel).get
      val t = s"${rm.catalogName}.main.orders_mor_cdf"
      s.sql(s"UPDATE $t SET o_orderpriority = 'MOR' WHERE o_orderkey % 100 = 0")
      s.sql(s"DELETE FROM $t WHERE o_orderkey % 100 = 7")
      s.sql(s"UPDATE $t SET o_orderpriority = 'MOR2' WHERE o_orderkey % 200 = 0")
      val feed = s.read.format("graft")
        .option("readChangeFeed", "true")
        .option("startingVersion", (v0 + 1).toString)
        .load(rm.path(rel))
      feed.withColumn("commit_seq",
          dense_rank().over(Window.orderBy(col("_commit_version"))).cast("int"))
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"),
          col("_change_type").as("change_type"), col("commit_seq"))
        .orderBy(col("commit_seq"), col("change_type"), col("o_orderkey"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_mor_change_feed" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders)
        |SELECT * FROM (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority,
        |         'delete' AS change_type, 1 AS commit_seq
        |  FROM base WHERE o_orderkey % 100 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 'MOR', 'insert', 1
        |  FROM base WHERE o_orderkey % 100 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderpriority, 'delete', 2
        |  FROM base WHERE o_orderkey % 100 = 7
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 'MOR', 'delete', 3
        |  FROM base WHERE o_orderkey % 200 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 'MOR2', 'insert', 3
        |  FROM base WHERE o_orderkey % 200 = 0
        |) ORDER BY commit_seq, change_type, o_orderkey""".stripMargin,

    "q_mat_pipeline" ->
      """SELECT l_orderkey, COUNT(*) AS n_big_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS gross
        |FROM lineitem WHERE l_quantity > 45
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q_mat_materialized_view" ->
      """SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_name
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q_mat_seed" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'emea', true, 1.5),
        |  (CAST(2 AS BIGINT), 'amer', false, 2.5),
        |  (CAST(3 AS BIGINT), 'apac', true, 3.75))
        |AS t(id, region_name, active, score) ORDER BY id""".stripMargin,

    "q_mat_bucketed_join" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_items
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_orderdate ORDER BY o_orderkey""".stripMargin,

    "q_mat_zorder" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_custkey % 10 = 3 AND o_totalprice > 50000.0
        |ORDER BY o_orderkey""".stripMargin,

    "q_v2_sql_write" ->
      """SELECT o_orderkey, o_totalprice, CAST(year(o_orderdate) AS INT) AS o_year
        |FROM orders WHERE year(o_orderdate) <> 1992
        |ORDER BY o_orderkey""".stripMargin,

    "q_v2_dml" ->
      """SELECT o_orderkey, o_totalprice,
        |  CASE WHEN o_orderkey % 100 = 0 THEN 'DML' ELSE o_orderpriority END AS o_orderpriority
        |FROM orders WHERE o_orderkey % 100 <> 7
        |ORDER BY o_orderkey""".stripMargin,

    "q_mor_dml" ->
      """SELECT o_orderkey, o_totalprice,
        |  CASE WHEN o_orderkey % 200 = 0 THEN 'MOR2'
        |       WHEN o_orderkey % 100 = 0 THEN 'MOR'
        |       ELSE o_orderpriority END AS o_orderpriority
        |FROM orders WHERE o_orderkey % 100 <> 7
        |ORDER BY o_orderkey""".stripMargin,

    "q_mat_incremental_merge" -> mergedOracle,
    "q_mat_incremental_delete_insert" -> mergedOracle,

    "q_mat_incremental_append" ->
      "SELECT * FROM orders ORDER BY o_orderkey",

    "q_mat_insert_overwrite" ->
      s"""SELECT o_orderkey,
         |  CASE WHEN strftime(o_orderdate, '%Y-%m') IN (
         |    SELECT DISTINCT strftime(o_orderdate, '%Y-%m') FROM orders
         |    WHERE year(o_orderdate) = 1996)
         |  THEN 'NEW' ELSE 'OLD' END AS o_orderpriority,
         |  strftime(o_orderdate, '%Y-%m') AS o_month
         |FROM orders
         |ORDER BY o_orderkey""".stripMargin,

    "q_mat_microbatch" ->
      """SELECT date_trunc('day', ts) AS day, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "q_mat_snapshot_timestamp" ->
      s"""WITH v1 AS (
         |  SELECT o_orderkey, o_totalprice, o_orderdate AS updated_at
         |  FROM orders WHERE o_orderdate < TIMESTAMP '$D'),
         |v2 AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
         |    CASE WHEN o_orderkey % 7 = 0 THEN o_orderdate + INTERVAL 100 DAY ELSE o_orderdate END AS updated_at
         |  FROM orders),
         |changed AS (
         |  SELECT v1.o_orderkey, v1.o_totalprice AS old_price, v1.updated_at AS old_u,
         |         v2.o_totalprice AS new_price, v2.updated_at AS new_u
         |  FROM v1 JOIN v2 USING (o_orderkey) WHERE v1.updated_at < v2.updated_at)
         |SELECT o_orderkey, old_price AS o_totalprice, old_u AS dbt_valid_from, new_u AS dbt_valid_to FROM changed
         |UNION ALL
         |SELECT o_orderkey, new_price, new_u, NULL FROM changed
         |UNION ALL  -- unchanged v1 rows stay open
         |SELECT v1.o_orderkey, v1.o_totalprice, v1.updated_at, NULL
         |FROM v1 JOIN v2 USING (o_orderkey) WHERE v1.updated_at >= v2.updated_at
         |UNION ALL  -- new keys
         |SELECT v2.o_orderkey, v2.o_totalprice, v2.updated_at, NULL
         |FROM v2 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM v1)
         |ORDER BY o_orderkey, dbt_valid_from""".stripMargin,

    "q_mat_snapshot_check" ->
      """WITH v1 AS (
        |  SELECT c_custkey, c_mktsegment FROM customer),
        |v2 AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 0 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer)
        |SELECT v1.c_custkey, v1.c_mktsegment,
        |  TIMESTAMP '2024-01-01 00:00:00' AS dbt_valid_from,
        |  CASE WHEN v1.c_mktsegment <> v2.c_mktsegment
        |       THEN TIMESTAMP '2024-06-01 00:00:00' END AS dbt_valid_to
        |FROM v1 JOIN v2 USING (c_custkey)
        |UNION ALL
        |SELECT v2.c_custkey, v2.c_mktsegment,
        |  TIMESTAMP '2024-06-01 00:00:00', NULL
        |FROM v1 JOIN v2 USING (c_custkey) WHERE v1.c_mktsegment <> v2.c_mktsegment
        |ORDER BY c_custkey, dbt_valid_from""".stripMargin
  )
}
