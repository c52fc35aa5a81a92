package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Crash-exact resume for scheduled operations (r18 — ADVICE r17 medium,
  * VERDICT task 4): witness ordering makes COMPLETE gc_compact re-runs
  * idempotent, but a crash BETWEEN statements (negative term-stats append
  * committed, doc_lens witness delete not yet run) used to double-negate
  * df on the next build. This spec kills the real examples/retrieval_gc
  * operation at EVERY statement boundary — after each statement's commit
  * but before its journal record ("committed", the window only the
  * per-statement replay-guard txn covers), and after the record
  * ("journaled") — then re-runs the build and asserts the final state
  * equals a clean twin run, statement for statement. */
class OperationResumeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def build(proj: String, runEnd: String,
                    extraVars: Map[String, String] = Map.empty,
                    sink: java.io.Writer = java.io.Writer.nullWriter()): Int =
    graft.Main.execute(spark, graft.Main.Args(command = "build", project = proj,
      vars = Map("run_end" -> runEnd) ++ extraVars),
      new java.io.PrintWriter(sink, true))

  private def rmOf(proj: String) =
    new graft.relations.RelationManager(spark, s"$proj/target/warehouse")

  private def rel(n: String) = graft.core.Relation("graft", "main", n)

  /** Everything the serving contract can observe: the served top-10, the
    * live store masses, and Σdf. */
  private def finalState(proj: String): (Seq[String], Long, Long, Long) = {
    val rm = rmOf(proj)
    (rm.read(rel("bm25_top10")).orderBy("query_id", "rank")
       .collect().toSeq.map(_.toString),
      rm.read(rel("postings")).count(),
      rm.read(rel("term_stats")).agg(coalesce(sum(col("df")), lit(0L)))
        .collect()(0).getLong(0),
      rm.read(rel("doc_lens")).count())
  }

  private def cleanup(proj: String): Unit = {
    graft.Tables.names.foreach(n => spark.catalog.dropTempView(s"corpus_$n"))
    graft.queries.OpsQueries.deleteDir(proj)
  }

  test("killing gc_compact at every statement boundary heals on re-run") {
    val clean = graft.queries.OpsQueries.stageProject("examples/retrieval_gc", sf)
    val want = try {
      assert(build(clean, "2025-01-02T00:00:00Z") == 0)
      assert(build(clean, "2025-01-03T00:00:00Z") == 0)
      finalState(clean)
    } finally cleanup(clean)
    // the three DML statements at both phases, plus the first CALL
    // (vacuum — idempotent, replayed whole on resume)
    val faults = (for (i <- 0 until 3; ph <- Seq("committed", "journaled"))
      yield (i, ph)) :+ ((3, "committed"))
    for ((i, ph) <- faults) {
      val proj = graft.queries.OpsQueries.stageProject("examples/retrieval_gc", sf)
      try {
        assert(build(proj, "2025-01-02T00:00:00Z") == 0, s"gen1 at $i/$ph")
        graft.runner.Runner.opBoundaryHook = (node, idx, phase) =>
          if (node == "gc_compact" && idx == i && phase == ph)
            throw new RuntimeException(s"injected crash at $idx/$phase")
        try assert(build(proj, "2025-01-03T00:00:00Z") != 0,
          s"build must fail at the injected $i/$ph crash")
        finally graft.runner.Runner.opBoundaryHook = (_, _, _) => ()
        assert(rmOf(proj).readOpJournal("gc_compact").isDefined,
          s"the journal must survive the crash at $i/$ph")
        // resume: same window; the statement at the crash boundary either
        // skips via its replay-guard txn ("committed") or re-runs from
        // the journal ("journaled") — never double-applies
        assert(build(proj, "2025-01-03T00:00:00Z") == 0, s"resume at $i/$ph")
        assert(rmOf(proj).readOpJournal("gc_compact").isEmpty,
          "the journal is cleared on completion")
        assert(finalState(proj) == want,
          s"resumed state must equal the clean run at $i/$ph")
      } finally cleanup(proj)
    }
  }

  test("--empty dry runs skip operation DML and recovery (r18)") {
    val proj = graft.queries.OpsQueries.stageProject("examples/retrieval_gc", sf)
    try {
      assert(build(proj, "2025-01-02T00:00:00Z") == 0)
      val rm = rmOf(proj)
      val mass = rm.read(rel("postings")).count()
      val tsV = rm.currentState(rel("term_stats")).get.version
      val out = new java.io.StringWriter()
      val code = graft.Main.execute(spark, graft.Main.Args(
        command = "build", project = proj, empty = true,
        vars = Map("run_end" -> "2025-01-02T00:00:00Z")),
        new java.io.PrintWriter(out, true))
      assert(code == 0, out.toString)
      assert(out.toString.contains("skipped (--empty"),
        s"the dry run must attribute the operation skip: ${out.toString}")
      // the dry run mutated no store state through the operation
      assert(rm.read(rel("postings")).count() == mass)
      assert(rm.currentState(rel("term_stats")).get.version == tsV,
        "--empty must not run the compensating append")
    } finally cleanup(proj)
  }

  test("statement drift over a partial run fails loud with the repair procedure") {
    val proj = graft.queries.OpsQueries.stageProject("examples/retrieval_gc", sf)
    try {
      val opFile = java.nio.file.Paths.get(proj, "operations", "gc_compact.sql")
      val original = java.nio.file.Files.readString(opFile)
      assert(build(proj, "2025-01-02T00:00:00Z") == 0)
      // crash gen2's operation after the postings DELETE is journaled but
      // before the doc_lens witness delete
      graft.runner.Runner.opBoundaryHook = (node, idx, phase) =>
        if (node == "gc_compact" && idx == 1 && phase == "journaled")
          throw new RuntimeException("injected crash at 1/journaled")
      try assert(build(proj, "2025-01-03T00:00:00Z") != 0)
      finally graft.runner.Runner.opBoundaryHook = (_, _, _) => ()
      // a manual run-operation over the incomplete run must refuse: the
      // manual form reads the whole feed unguarded and would re-derive
      // compensation the crashed run already committed
      val manualOut = new java.io.StringWriter()
      val manualCode = graft.Main.execute(spark, graft.Main.Args(
        command = "run-operation", project = proj,
        positional = Seq("gc_compact")),
        new java.io.PrintWriter(manualOut, true))
      assert(manualCode != 0 && manualOut.toString.contains("crash journal"),
        s"run-operation must refuse over an incomplete run: $manualCode ${manualOut.toString}")
      // edit the operation's SQL over the partial run: resuming DIFFERENT
      // statements against a half-mutated store would break the
      // compensation pairing, so recovery must refuse, loudly, before
      // any node runs
      java.nio.file.Files.writeString(opFile,
        original.replace("keep_versions => 2", "keep_versions => 3"))
      // recovery aborts the WHOLE build (throws out of the runner before
      // any node runs) — the stores need operator attention first
      val e = intercept[IllegalStateException](build(proj, "2025-01-03T00:00:00Z"))
      assert(e.getMessage.contains("REPAIR"),
        s"the failure must carry the repair procedure: ${e.getMessage}")
      // the documented repair: restore the crashed run's statements —
      // recovery completes the partial run at run start, then the build
      // proceeds normally
      java.nio.file.Files.writeString(opFile, original)
      assert(build(proj, "2025-01-03T00:00:00Z") == 0, "repair resume")
      assert(rmOf(proj).readOpJournal("gc_compact").isEmpty)
      graft.ops.Retrieval.requireFreshTermStats(rmOf(proj),
        rel("term_stats"), rel("postings"))
    } finally cleanup(proj)
  }
}
