package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Optimization-round measurement tool: dumps `.explain("formatted")` for
  * declared queries to files, so plan claims in OPTIMIZATION_r*.md are
  * checkable against committed artifacts without running Spark.
  *
  *   sbt "runMain graft.PlanDump /root/testdata/sf0.1 plans/r18 before q_a,q_b"
  *
  * Session config mirrors Bench exactly (AQE, shuffle partitions = CPUS,
  * broadcast threshold) so the dumped plan is the plan the bench times.
  * Formatted explain shows the INITIAL plan (AQE isFinalPlan=false); join
  * strategy / exchange counts read from it are pre-AQE, which is the
  * comparable shape across changes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <suffix> [names]")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names: Seq[String] = args.lift(3) match {
      case Some(list) => list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64L * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(q) =>
          try {
            val df = q(spark, sfDir)
            val txt = df.queryExecution.explainString(FormattedMode)
            java.nio.file.Files.write(dir.resolve(s"${name}_$suffix.txt"),
              txt.getBytes("UTF-8"))
            println(s"[plandump] wrote ${name}_$suffix.txt")
          } catch { case t: Throwable =>
            System.err.println(s"[plandump] $name failed: ${t.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
