package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] demonstrates one operator from SURVEY §2
  * (materializations, data-quality tests, the cross-db function surface,
  * and the training-data-pipeline extensions); [[oracleSql]] carries the
  * DuckDB-equivalent SQL for the driver's correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** Self-contained smoke main (r19 — VERIFY_r18 flagged `entry_ok:false`
    * with q1 itself healthy at both SFs, i.e. an invocation-shape gap, not
    * an engine bug): `runMain graft.SparkEntry` now builds a session the
    * same way the other mains do, runs [[entry]], and exits nonzero unless
    * it returns rows. Prints one bare line `entry_rows=<n>` for tail
    * consumers. */
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSparkSessionExtension")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // r19 measurement-bug fix: the default 100-entry codegen class
      // cache cannot hold a multi-query application's working set, so
      // every re-execution paid a full Janino whole-stage recompilation
      // INSIDE task threads (measured: q_retrieval_bm25_stats 26.7 CPU /
      // 2.48 wall with the default vs 3.9 CPU / 0.98 wall with the cache
      // sized to fit — OPTIMIZATION_r19.md has the receipts). A
      // long-running deployment wants compiled plans cached; this is the
      // steady-state behavior the warm-up pass was designed to measure.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = entry(spark).count()
    println(s"entry_rows=$rows")
    spark.stop()
    if (rows <= 0) sys.exit(1)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ MatQueries.all ++ FnQueries.all ++ TestQueries.all ++ OpsQueries.all ++ StreamQueries.all ++ SemanticQueries.all ++ JoinQueries.all

  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ MatQueries.oracles ++ FnQueries.oracles ++
      TestQueries.oracles ++ OpsQueries.oracles ++ StreamQueries.oracles ++ SemanticQueries.oracles ++ JoinQueries.oracles

  /** Queries intentionally without a DuckDB oracle (non-SQL-expressible);
    * the driver records a weaker rows-only check for these. */
  def rowsOnlyChecked: Set[String] = Set.empty
}
