package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source-table access for the driver's TPC-H-ish star schema
  * (/root/repo/TESTDATA.md). In dbt terms these are `source()`
  * relations (reference: core/dbt/context/providers.py:1151); here a
  * source resolves to a parquet path under the scale-factor dir.
  *
  * Scale notes: every reader goes through `spark.read.parquet`, so
  * Catalyst's vectorized parquet scan, predicate pushdown, and column
  * pruning apply unchanged whether the path is a 6k-row local file or
  * a 100 TB partitioned table on object storage.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any realistic SF. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier", "part", "customer")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read it as raw nanos (legacy long mode) and convert to a
    * microsecond timestamp — same truncation DuckDB applies when casting
    * timestamp_ns → timestamp. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    // integer DIV, not `/`: long/long in Spark SQL is DOUBLE division, and a
    // ~1.7e18 nanosecond value exceeds double's 53-bit mantissa → off-by-1µs
    raw.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` models can use
    * bare table names (mirrors the driver's DuckDB oracle setup). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
