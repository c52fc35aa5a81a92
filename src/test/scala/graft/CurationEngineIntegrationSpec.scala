package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Relation
import graft.ops.Dedup
import graft.relations.RelationManager
import java.nio.file.Files

/** The two halves of the repo composed: the curation operators running
  * INCREMENTALLY against the engine's own commit-log storage — a curated
  * corpus table whose fingerprints dedup every subsequent ingest batch.
  * This is the continuous-ingest production shape: O(batch) curation per
  * arrival, the corpus table as the single source of truth. */
class CurationEngineIntegrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("incremental curation over a commit-log corpus table: only new content lands") {
    import spark.implicits._
    val rm = new RelationManager(spark,
      Files.createTempDirectory("graft_curation").toString)
    val rel = Relation("graft", "main", "corpus")

    // ingest batch 1: exact-dedup internally, store survivors + hashes
    val batch1 = Seq((1L, "alpha text"), (2L, "beta text"), (3L, "alpha text"))
      .toDF("doc_id", "text")
    val surv1 = Dedup.exact(batch1, "doc_id", "text")
      .filter(col("is_survivor"))
      .select(col("doc_id"), col("content_hash"))
      .join(batch1, "doc_id")
      .select("doc_id", "text", "content_hash")
    rm.writeTable(surv1, rel)
    assert(rm.read(rel).count() == 2)

    // ingest batch 2: dedup against the TABLE's stored fingerprints —
    // the corpus is never re-hashed, only its hash column is read
    val batch2 = Seq(
      (10L, "alpha text"), // already in the corpus → dropped
      (11L, "gamma text"), // new → lands
      (12L, "gamma text")) // batch-internal dup → dropped
      .toDF("doc_id", "text")
    val classified = Dedup.exactIncremental(batch2, "doc_id", "text",
      rm.read(rel).select("content_hash"), "content_hash")
    val admit = batch2.join(
      classified.filter(col("is_new_content")).select("doc_id"), "doc_id")
      .withColumn("content_hash", md5(col("text")))
    rm.appendTable(admit, rel)

    val corpus = rm.read(rel).select("doc_id", "text").as[(Long, String)]
      .collect().toSet
    assert(corpus == Set((1L, "alpha text"), (2L, "beta text"), (11L, "gamma text")),
      s"corpus after two ingests: $corpus")

    // replaying batch 2 is a curation no-op: everything now dups the corpus
    val replay = Dedup.exactIncremental(batch2, "doc_id", "text",
      rm.read(rel).select("content_hash"), "content_hash")
    assert(replay.filter(col("is_new_content")).count() == 0,
      "re-ingesting an absorbed batch must admit nothing")

    // and the corpus-table read for dedup prunes to the hash column only
    val probe = rm.read(rel).select("content_hash")
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<content_hash:string"),
      s"fingerprint scan must prune to the hash column:\n$plan")
  }

  test("incremental curation project: nightly build touches only the new generation; replay law holds") {
    // r15 (VERDICT task 1): the examples/curation_incremental project
    // run twice through the REAL CLI path with the run window advanced
    // one day per build. Proofs:
    //   1. build 2 advances every microbatch stage exactly ONE commit
    //      whose added files live only in the day-2 partition (commit-
    //      log file counts — the O(batch) nightly claim), day-1 files
    //      untouched;
    //   2. every artifact MV reports "fresh" (version unchanged);
    //   3. REPLAY LAW: the accumulated audit of the two incremental
    //      builds equals a from-scratch single build over both days;
    //   4. re-running build 2 is a no-op (checkpoint caught up).
    val sf = "/root/testdata/sf0.001"
    def runBuild(proj: String, runEnd: String): Seq[String] = {
      val buf = new java.io.StringWriter()
      val code = graft.Main.execute(spark, graft.Main.Args(
        command = "build", project = proj,
        vars = Map("run_end" -> runEnd)),
        new java.io.PrintWriter(buf, true))
      assert(code == 0, s"build run_end=$runEnd failed:\n$buf")
      buf.toString.linesIterator.toSeq
    }
    val nanosWas = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    val projA = graft.queries.OpsQueries.stageProject("examples/curation_incremental", sf)
    val projB = graft.queries.OpsQueries.stageProject("examples/curation_incremental", sf)
    try {
      def rel(n: String) = Relation("graft", "main", n)
      val stages = Seq("rules", "scored", "dsir", "ledger", "audit")
      val artifacts = Seq("lm_uni", "lm_bi", "ppl_cuts", "dsir_model", "dsir_cut")
      val rmA = new RelationManager(spark, s"$projA/target/warehouse")
      runBuild(projA, "2025-01-02T00:00:00Z")
      val after1 = (stages ++ artifacts).map(n => n -> rmA.currentState(rel(n)).get).toMap
      val log2 = runBuild(projA, "2025-01-03T00:00:00Z")
      stages.foreach { n =>
        val (v1, v2) = (after1(n), rmA.currentState(rel(n)).get)
        assert(v2.version == v1.version + 1,
          s"$n: nightly build must commit exactly once (v${v1.version} -> v${v2.version})")
        val added = v2.files.filterNot(v1.files.toSet)
        assert(added.nonEmpty && added.forall(_.contains("__graft_batch=2025-01-02")),
          s"$n: build 2 added non-day-2 files: $added")
        assert(v1.files.forall(v2.files.toSet), s"$n: build 2 rewrote day-1 files")
      }
      artifacts.foreach { n =>
        assert(rmA.currentState(rel(n)).get.version == after1(n).version,
          s"artifact $n must stay frozen across nightly builds")
      }
      assert(artifacts.forall(n => log2.exists(l => l.contains(s".$n") && l.contains("fresh"))),
        s"every artifact MV must report fresh on build 2:\n${log2.mkString("\n")}")
      // replay law: incremental two-build audit == one-shot full build
      val rmB = new RelationManager(spark, s"$projB/target/warehouse")
      runBuild(projB, "2025-01-03T00:00:00Z")
      def rows(rm: RelationManager) = rm.read(rel("audit"))
        .drop("__graft_batch").orderBy("doc_id")
        .collect().map(_.toString).toSeq
      val (inc, full) = (rows(rmA), rows(rmB))
      assert(inc == full && inc.nonEmpty,
        s"two incremental builds must equal the one-shot replay (${inc.size} vs ${full.size})")
      // idempotency: same run_end again → checkpoint caught up, no commit
      val v2 = rmA.currentState(rel("audit")).get.version
      runBuild(projA, "2025-01-03T00:00:00Z")
      assert(rmA.currentState(rel("audit")).get.version == v2,
        "re-running the same window must be a microbatch no-op")
    } finally {
      graft.Tables.names.foreach(n => spark.catalog.dropTempView(s"corpus_$n"))
      nanosWas match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
      graft.queries.OpsQueries.deleteDir(projA)
      graft.queries.OpsQueries.deleteDir(projB)
    }
  }

  test("incremental substring excision over a commit-log window store") {
    import spark.implicits._
    val rm = new RelationManager(spark,
      Files.createTempDirectory("graft_winstore").toString)
    val winRel = Relation("graft", "main", "corpus_windows")

    // batch 1: batch-only excision, then persist its window hashes as
    // the store table — the state a continuous ingest accumulates
    val batch1 = Seq((1L, "w1 w2 w3 w4 first body tail")).toDF("doc_id", "text")
    val clean1 = Dedup.substringExcise(batch1, "doc_id", "text", n = 4)
    rm.writeTable(Dedup.windowHashes(
      clean1.withColumnRenamed("clean_text", "text"), "doc_id", "text", n = 4), winRel)

    // batch 2 repeats a batch-1 window → excised against the TABLE,
    // without re-hashing batch-1 text (only the store's hash column reads)
    val batch2 = Seq(
      (10L, "w1 w2 w3 w4 second arrival here"),
      (11L, "v1 v2 v3 v4 brand new content")).toDF("doc_id", "text")
    val out2 = Dedup.substringExciseIncremental(batch2, "doc_id", "text", n = 4,
      rm.read(winRel), "h")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(out2(10L) == (("second arrival here", 4L)))
    assert(out2(11L) == (("v1 v2 v3 v4 brand new content", 0L)))

    // append batch 2's post-excision windows; a batch-3 repeat of
    // batch-2 content now excises against the grown store
    val clean2 = Seq((11L, "v1 v2 v3 v4 brand new content")).toDF("doc_id", "text")
    rm.appendTable(Dedup.windowHashes(clean2, "doc_id", "text", n = 4), winRel)
    val batch3 = Seq((20L, "v1 v2 v3 v4 third wave text")).toDF("doc_id", "text")
    val out3 = Dedup.substringExciseIncremental(batch3, "doc_id", "text", n = 4,
      rm.read(winRel), "h")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out3(20L) == "third wave text")
  }
}
