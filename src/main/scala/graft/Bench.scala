package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): times the headline query set at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Headliners are the read-path operators (scan/agg/join/window/dedup/
  * similarity/text) — the throughput surface a 100 TB deployment cares
  * about. Materialization demos (which time warehouse *writes* of the
  * whole table) are excluded from the timing set but remain in the
  * correctness gate. One warm-up executes the q1 plan so JVM/codegen
  * startup isn't attributed to the first query.
  *
  * Failure policy ("no silent caps"): a query that throws is NEVER
  * timed — its elapsed would be analysis-failure latency, which reads
  * as a 10× speed-up in the trend. Dead queries are excluded from
  * `headline_total`, reported under `"errors"`, flagged with
  * `"partial":true`, and the process exits nonzero, so a bench over
  * broken queries can't masquerade as a clean run.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q1_pricing_summary",
    "q2_revenue_by_nation",
    "q3_top_orders_per_customer",
    "q4_events_daily",
    "q_fn_dates",
    "q_test_unique",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_sim_topk_brute",
    "q_text_quality",
    "q_text_langid",
    "q_stream_windowed")

  private def brief(t: Throwable): String = {
    val m = Option(t.getMessage).getOrElse(t.getClass.getName)
    m.replaceAll("\\s+", " ").take(200)
  }

  private def jq(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Warm-up + best-of-`passCount` timing over `timed`; returns the
    * single-line JSON artifact and the per-query error map (empty on a
    * clean run). Separated from [[main]] so the failure contract is
    * spec-testable without forking a JVM (BenchContractSpec). */
  def run(spark: SparkSession, sfDir: String, timed: Seq[String],
          queries: Map[String, (SparkSession, String) => DataFrame],
          passCount: Int = 3): (String, Map[String, String]) = {
    // Execute via a noop-format write, not count(): a row count lets
    // Catalyst prune deterministic projections/sorts (ColumnPruning,
    // EliminateSorts), which would un-measure projection-only queries.
    // The noop sink consumes every column of every row with zero I/O.
    def exec(name: String): Unit =
      queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()

    val errs = scala.collection.mutable.LinkedHashMap.empty[String, String]

    // Warm-up pass: executes every headline plan once so JIT + whole-stage
    // codegen class compilation + parquet footer caches are attributed to
    // startup, not to the measured pass. The timed pass rebuilds each plan
    // from scratch (no persisted state survives — each query invocation
    // constructs and executes its full DataFrame DAG), so it measures
    // steady-state engine throughput, the metric that matters for a
    // long-running cluster.
    timed.foreach { name =>
      try exec(name)
      catch { case t: Throwable => errs.getOrElseUpdate(name, brief(t)) }
    }
    spark.catalog.clearCache()

    // Best-of-N, pass-interleaved: each pass times every query once, and a
    // query reports its MINIMUM across passes. A transient load spike on
    // the bench host (the r5 driver run: every query +5%..+195%, suite
    // wall-clock +46% — adjudicated as box load in SCALE.md) now has to
    // persist across three separated attempts to distort a number, instead
    // of one unlucky second. Min, not mean: noise on this box is strictly
    // additive (GC, CPU contention), so the floor is the best estimate of
    // the code's actual cost.
    val passes = (1 to passCount).map { _ =>
      timed.flatMap { name =>
        if (errs.contains(name)) None
        else {
          val t0 = System.nanoTime()
          val ok =
            try { exec(name); true }
            catch { case t: Throwable => errs.getOrElseUpdate(name, brief(t)); false }
          val elapsed = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache() // no persisted-frame leakage between queries
          if (ok) Some(name -> elapsed) else None
        }
      }.toMap
    }
    val results = timed.filterNot(errs.contains).map(name =>
      name -> passes.flatMap(_.get(name)).min)
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val errJson =
      if (errs.isEmpty) ""
      else errs.map { case (k, v) => s"${jq(k)}:${jq(v)}" }
        .mkString(""","partial":true,"errors":{""", ",", "}")
    val json =
      f"""{"metric":"headline_total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"$errJson}"""
    (json, errs.toMap)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // `runMain graft.Bench q_a,q_b` restricts the timed set — local A/B
    // iteration on one query without paying the full suite. A program
    // argument, not an env var: `sbt -client` executes in the long-lived
    // server JVM, which never sees the invoking shell's environment.
    // The driver runs with no args, so the contract output is unchanged.
    val timed = args.headOption
      .map(_.split(",").map(_.trim).toSet)
      .map(only => headline.filter(only)).getOrElse(headline)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSparkSessionExtension")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64L * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (json, errs) = run(spark, sfDir, timed, SparkEntry.queries)
    println(json)
    spark.stop()
    if (errs.nonEmpty) {
      System.err.println(s"[bench] ${errs.size} of ${timed.size} queries FAILED: ${errs.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
