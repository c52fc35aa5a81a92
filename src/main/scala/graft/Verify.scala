package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional third arg: comma-separated query-name filter for local
    // single-query iteration (the Bench `only` convention). The driver
    // calls with two args — contract output unchanged.
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    // a typo'd name would otherwise run an EMPTY sweep that exits 0 and
    // looks green — the exact silent-partial-sweep this main's failure
    // policy exists to prevent
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown queries ${unknown.toSeq.sorted.mkString(", ")} — " +
          "check SparkEntry.queries for the exact names")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    new java.io.File(outDir).mkdirs()
    // Failure policy ("no silent caps"): keep sweeping past a dead query
    // so one casualty doesn't hide the rest, but record every failure in
    // errors.json (name → message) inside the artifact dir and exit
    // nonzero at the end — a partial sweep must be machine-detectable
    // from the artifact alone, not only from a stderr line.
    val errs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("\\s+", " ").take(500)
        System.err.println(s"[verify] $name failed: $msg")
        errs.put(name, msg)
      }
      // drop per-query persisted frames (dedup signatures etc.) so cached
      // blocks don't accumulate across the 50+ query sweep
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // the oracle map honors the same filter as the parquet dumps (r14,
    // ADVICE): an all-queries oracle_sql.json next to a filtered output
    // dir would make a local check.py replay report every unfiltered
    // query as a missing output instead of skipping it
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errs.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    spark.stop()
    if (errs.nonEmpty) {
      System.err.println(
        s"[verify] PARTIAL SWEEP: ${errs.size} of ${SparkEntry.queries.size} queries failed: ${errs.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
