package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Relation
import graft.materializations.Materializations
import graft.relations.RelationManager

/** Stored change files (change_feed): rewrites materialize their row-level
  * insert/delete images at write time, so the per-commit feed reads
  * diff-free — even after the replaced data files are vacuumed. */
class CdfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def newRm() = new RelationManager(spark, Files.createTempDirectory("graft_cdf").toString)

  private def seed(rm: RelationManager, rel: Relation, n: Int, files: Int) = {
    import spark.implicits._
    rm.writeTable((0 until n).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartitionByRange(files, $"id"), rel, statsCols = Seq("id"))
  }

  test("stored changes equal the computed diff, row for row") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "cdf", "stored_eq")
    seed(rm, rel, 1000, 5)

    val batch = Seq((3L, "updated"), (2000L, "new")).toDF("id", "v")
    Materializations.mergeInto(rm, rel, batch, Seq("id"),
      updateColumns = Nil, storeChanges = true)
    val v = rm.currentVersion(rel).get

    val stored = rm.readCommitChanges(rel, v - 1, v)
      .select("id", "v", "_change_type")
    val computed = rm.readRowChanges(rel, v - 1, v)
      .select("id", "v", "_change_type")
    assert(stored.exceptAll(computed).isEmpty && computed.exceptAll(stored).isEmpty,
      s"stored feed must equal the lazy diff:\nstored=${stored.collect().toSeq}\n" +
        s"computed=${computed.collect().toSeq}")
    // and it is exactly the batch's net effect: one update (delete+insert) + one insert
    val byType = stored.groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 2L, "delete" -> 1L), byType.toString)
  }

  test("stored feed reads diff-free after the replaced files are gone") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "cdf", "vacuum_proof")
    seed(rm, rel, 1000, 5)
    val before = rm.currentState(rel).get

    Materializations.deleteInsert(rm, rel,
      Seq((1L, "r1"), (2L, "r2")).toDF("id", "v"), Seq("id"), storeChanges = true)
    val v = rm.currentVersion(rel).get

    // vacuum to only the current version: the REPLACED file's bytes are
    // deleted, so the on-demand diff is impossible — the stored feed isn't
    rm.vacuum(rel, keepVersions = 1)
    val gone = before.files.filterNot(rm.currentState(rel).get.files.toSet)
    assert(gone.nonEmpty && gone.forall(f => !Files.exists(java.nio.file.Paths.get(rm.path(rel)).resolve(f))),
      "vacuum must have deleted the replaced file")

    val feed = rm.readCommitChanges(rel, v - 1, v)
    assert(feed.filter($"_change_type" === "insert").count() == 2)
    assert(feed.filter($"_change_type" === "delete").count() == 2)
    assert(feed.select("_commit_version").distinct().as[Int].head() == v)
  }

  test("multi-commit feed: stored and computed intervals mix; appends fall back") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "cdf", "mixed")
    seed(rm, rel, 100, 2)
    val v0 = rm.currentVersion(rel).get

    // commit 1: merge WITH stored changes
    Materializations.mergeInto(rm, rel, Seq((5L, "m5")).toDF("id", "v"),
      Seq("id"), updateColumns = Nil, storeChanges = true)
    // commit 2: plain append (no stored changes → computed fallback)
    rm.appendTable(Seq((500L, "a500")).toDF("id", "v"), rel)
    val v2 = rm.currentVersion(rel).get
    assert(v2 == v0 + 2)

    val feed = rm.readCommitChanges(rel, v0, v2)
    val perCommit = feed.groupBy("_commit_version", "_change_type").count()
      .as[(Int, String, Long)].collect().toSet
    assert(perCommit == Set((v0 + 1, "insert", 1L), (v0 + 1, "delete", 1L),
      (v2, "insert", 1L)), perCommit.toString)
    // the append interval's feed is its new rows
    assert(feed.filter($"_commit_version" === v2).select("id").as[Long].head() == 500L)
  }

  test("connector batch change feed: stored, pure-add, and pure-remove commits") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "cdf", "conn_batch")
    seed(rm, rel, 100, 2)                                          // v1: pure add
    Materializations.mergeInto(rm, rel, Seq((5L, "m5"), (200L, "new")).toDF("id", "v"),
      Seq("id"), updateColumns = Nil, storeChanges = true)          // v2: stored
    rm.appendTable(Seq((300L, "a300")).toDF("id", "v"), rel)        // v3: pure add
    rm.truncate(rel)                                                // v4: pure remove
    val dir = rm.path(rel).toString

    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", 1).load(dir)
    assert(feed.columns.toSeq == Seq("id", "v", "_change_type", "_commit_version"))
    val perCommit = feed.groupBy("_commit_version", "_change_type").count()
      .as[(Int, String, Long)].collect().toSet
    // v1: 100 inserts; v2: 2 inserts + 1 delete; v3: 1 insert;
    // v4 (truncate): every live row deletes = 100 - 1 + 2 + 1 = 102
    assert(perCommit == Set((1, "insert", 100L), (2, "insert", 2L),
      (2, "delete", 1L), (3, "insert", 1L), (4, "delete", 102L)), perCommit.toString)
    // interval selection (both bounds INCLUSIVE per Delta CDF): only v2's
    // stored rows
    val v2only = spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", 2).option("endingVersion", 2).load(dir)
    assert(v2only.count() == 3)
    // and it agrees with the engine's per-commit feed row for row
    val engine = rm.readCommitChanges(rel, 1, 2)
      .select("id", "v", "_change_type", "_commit_version")
    assert(v2only.select("id", "v", "_change_type", "_commit_version")
      .exceptAll(engine).isEmpty && engine.exceptAll(
        v2only.select("id", "v", "_change_type", "_commit_version")).isEmpty)
  }

  test("connector streaming change feed tails commits exactly once") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "cdf", "conn_stream")
    seed(rm, rel, 10, 1)
    val dir = rm.path(rel).toString

    // startingVersion 1 INCLUSIVE — a stream without it tails only NEW
    // commits (Delta CDF semantics), which would skip the v1 seeds
    val q = spark.readStream.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", 1)
      .load(dir)
      .writeStream.format("memory").queryName("cdf_stream_sink")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_cdf_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdf_stream_sink").count() == 10) // v1 inserts

      Materializations.mergeInto(rm, rel, Seq((3L, "m3")).toDF("id", "v"),
        Seq("id"), updateColumns = Nil, storeChanges = true)
      q.processAllAvailable()
      val rows = spark.table("cdf_stream_sink")
      assert(rows.count() == 12, "10 seeds + update pair, exactly once")
      assert(rows.filter($"_commit_version" === 2 && $"_change_type" === "delete")
        .select("v").as[String].head() == "v3")
      assert(rows.filter($"_commit_version" === 2 && $"_change_type" === "insert")
        .select("v").as[String].head() == "m3")
    } finally q.stop()
  }

  test("batch change feed without startingVersion is rejected (Delta CDF requires an explicit start)") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "cdf", "conn_nostart")
    seed(rm, rel, 10, 1)
    val e = intercept[Exception] {
      spark.read.format("graft").option("readChangeFeed", "true")
        .load(rm.path(rel).toString).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("startingVersion")), e.toString)
  }

  test("a vacuumed pure-remove interval fails with actionable guidance, not NoSuchFileException") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "cdf", "conn_vacuumed")
    seed(rm, rel, 10, 1)          // v1
    val v1Files = rm.currentState(rel).get.files
    rm.truncate(rel)              // v2: pure remove — delete images ARE v1's bytes
    val dir = java.nio.file.Paths.get(rm.path(rel))
    // simulate vacuum reclaiming the unreferenced data files
    v1Files.foreach(f => Files.deleteIfExists(dir.resolve(f)))
    val e = intercept[Exception] {
      spark.read.format("graft").option("readChangeFeed", "true")
        .option("startingVersion", 2).load(dir.toString).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("vacuumed")), e.toString)
    // intervals before the gap still read when their images survive: none
    // here, but the error must not have corrupted the table read path
    assert(spark.read.format("graft").load(dir.toString).count() == 0L)
  }

  test("a mixed rewrite without stored changes fails the feed plan loudly") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "cdf", "conn_err")
    seed(rm, rel, 100, 2)
    Materializations.mergeInto(rm, rel, Seq((5L, "m5")).toDF("id", "v"),
      Seq("id"), updateColumns = Nil) // no storeChanges
    val e = intercept[Exception] {
      spark.read.format("graft").option("readChangeFeed", "true")
        .option("startingVersion", 1).load(rm.path(rel).toString).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("change_feed")), e.toString)
  }

  test("merge-on-read DML on a change_feed table stores images: stored == computed, feed diff-free") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "cdf", "mor_stored")
    seed(rm, rel, 1000, 3)
    rm.setTableProperties(rel, Map(
      "row_level_mode" -> "merge-on-read", "change_feed" -> "true"))
    val t = s"${rm.catalogName}.cdf.mor_stored"
    val v0 = rm.currentVersion(rel).get

    spark.sql(s"UPDATE $t SET v = 'u7' WHERE id = 7")      // delta: delete+insert pair
    val vU = rm.currentVersion(rel).get
    spark.sql(s"DELETE FROM $t WHERE id = 13")              // delta: pure delete
    val vD = rm.currentVersion(rel).get
    Seq((500L, "m500"), (2000L, "m2000")).toDF("id", "v")
      .createOrReplaceTempView("cdf_mor_src")
    spark.sql(s"""MERGE INTO $t g USING cdf_mor_src s ON g.id = s.id
                  WHEN MATCHED THEN UPDATE SET v = s.v
                  WHEN NOT MATCHED THEN INSERT *""")        // delta: update + insert
    val vM = rm.currentVersion(rel).get

    // every delta commit recorded stored change files
    assert((vU to vM).forall(v => rm.history(rel, 10)
      .find(_.version == v).exists(_.storedChanges)),
      rm.history(rel, 10).toString)

    // stored == computed, per interval (the one-diff-formula contract)
    Seq((v0, vU), (vU, vD), (vD, vM)).foreach { case (a, b) =>
      val stored = rm.readCommitChanges(rel, a, b).select("id", "v", "_change_type")
      val computed = rm.readRowChanges(rel, a, b).select("id", "v", "_change_type")
      assert(stored.exceptAll(computed).isEmpty && computed.exceptAll(stored).isEmpty,
        s"interval ($a,$b]: stored=${stored.collect().toSeq} computed=${computed.collect().toSeq}")
    }

    // the connector batch feed serves the whole MoR interval — no loud
    // failure, exact images
    val feed = spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", vU).load(rm.path(rel))
    val byCommit = feed.groupBy("_commit_version", "_change_type").count()
      .as[(Int, String, Long)].collect().toSet
    assert(byCommit == Set((vU, "insert", 1L), (vU, "delete", 1L),
      (vD, "delete", 1L), (vM, "insert", 2L), (vM, "delete", 1L)), byCommit.toString)
    assert(feed.filter($"_commit_version" === vD && $"_change_type" === "delete")
      .select("id").as[Long].head() == 13L)

    // and the STREAMING feed tails the same commits
    val q = spark.readStream.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", vU).load(rm.path(rel))
      .writeStream.format("memory").queryName("cdf_mor_sink")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_cdf_mor_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdf_mor_sink").count() == 6)
    } finally q.stop()
  }

  test("copy-on-write SQL DML on a change_feed table stores images (feed no longer fails loudly)") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "cdf", "cow_sql_stored")
    seed(rm, rel, 100, 2)
    rm.setTableProperties(rel, Map("change_feed" -> "true"))
    val t = s"${rm.catalogName}.cdf.cow_sql_stored"
    val v0 = rm.currentVersion(rel).get

    spark.sql(s"UPDATE $t SET v = 'cow9' WHERE id = 9")     // mixed CoW rewrite
    val v1 = rm.currentVersion(rel).get
    val feed = spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", v1).option("endingVersion", v1)
      .load(rm.path(rel))
    val rows = feed.select("id", "v", "_change_type").as[(Long, String, String)]
      .collect().toSet
    assert(rows == Set((9L, "v9", "delete"), (9L, "cow9", "insert")), rows.toString)
    // stored == computed here too
    val stored = rm.readCommitChanges(rel, v0, v1).select("id", "v", "_change_type")
    val computed = rm.readRowChanges(rel, v0, v1).select("id", "v", "_change_type")
    assert(stored.exceptAll(computed).isEmpty && computed.exceptAll(stored).isEmpty)
  }

  test("the change_feed table property covers ENGINE rewrites too (one switch for all writers)") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "cdf", "prop_engine")
    seed(rm, rel, 100, 2)
    rm.setTableProperties(rel, Map("change_feed" -> "true"))
    val v0 = rm.currentVersion(rel).get
    // an engine merge WITHOUT storeChanges: the table property alone
    // must store the images (Delta enableChangeDataFeed semantics)
    Materializations.mergeInto(rm, rel, Seq((5L, "m5")).toDF("id", "v"),
      Seq("id"), updateColumns = Nil)
    val v1 = rm.currentVersion(rel).get
    assert(rm.history(rel, 5).find(_.version == v1).exists(_.storedChanges))
    val feed = spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", v1).load(rm.path(rel))
      .select("id", "v", "_change_type").as[(Long, String, String)].collect().toSet
    assert(feed == Set((5L, "v5", "delete"), (5L, "m5", "insert")), feed.toString)
  }

  test("randomized concurrent appends/merges/optimize never lose or duplicate rows") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val rm = newRm()
    val rel = Relation("graft", "cdf", "stress")
    seed(rm, rel, 500, 5) // ids 0..499

    // conflicting rewrites abort (ConcurrentModificationException) instead
    // of resurrecting rows — a real user retries. An op still conflicting
    // after retries is ABANDONED, which is safe (an aborted rewrite
    // changes nothing); compaction racing a merge stream genuinely can
    // starve, which is why production runs optimize out-of-band. The
    // invariant under test is that NOTHING corrupts, not that every op
    // eventually wins.
    def retrying(op: () => Unit): Unit = {
      var attempts = 0
      while (attempts < 8) {
        try { op(); return }
        catch { case _: java.util.ConcurrentModificationException => attempts += 1 }
      }
    }

    val rnd = new scala.util.Random(13)
    val plans: Seq[(Int, Seq[Int])] = (0 until 4).map(w =>
      w -> Seq.fill(5)(rnd.nextInt(3)))
    val appendedPerWorker = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val work = plans.map { case (w, ops) =>
      Future {
        ops.zipWithIndex.foreach { case (op, i) =>
          op match {
            case 0 => // append unique new ids (worker-tagged range)
              val base = 10000L + w * 1000L + i * 100L
              rm.appendTable((base until base + 10L).map(id => (id, s"w$w"))
                .toDF("id", "v"), rel)
              appendedPerWorker.merge(w, 10L, (a, b) => a + b)
            case 1 => // merge-update existing seed keys (no count change)
              val k = rnd.nextInt(500).toLong
              retrying(() => Materializations.mergeInto(rm, rel,
                Seq((k, s"upd-$w-$i")).toDF("id", "v"), Seq("id"),
                updateColumns = Nil))
            case 2 => // compaction racing the writers
              retrying(() => rm.optimize(rel))
          }
          // concurrent reads must always see a consistent snapshot
          assert(rm.read(rel).count() >= 500L)
        }
      }
    }
    Await.result(Future.sequence(work), 180.seconds)

    import scala.jdk.CollectionConverters._
    val expected = 500L + appendedPerWorker.values.asScala.map(l => l: Long).sum
    val out = rm.read(rel)
    assert(out.count() == expected, "no lost or resurrected rows")
    assert(out.select("id").distinct().count() == expected, "no duplicate keys")
    // every retained version still reconstructs
    val lg = rm.currentVersion(rel).get
    (math.max(1, lg - 5) to lg).foreach(v => rm.readAt(rel, v).count())
  }

  test("a zombie writer's duplicate epoch loses the commit CAS, not just the pre-check") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "cdf", "zombie")
    rm.writeTable(Seq((1L, "a")).toDF("id", "v"), rel)
    // both "drivers" passed the fast-path check (watermark < 5) — the
    // in-CAS txn guard must let exactly one batch-5 commit land
    rm.appendTable(Seq((2L, "b")).toDF("id", "v"), rel, txn = Map("q1" -> 5L))
    val e = intercept[graft.relations.StaleTxnException] {
      rm.appendTable(Seq((2L, "b")).toDF("id", "v"), rel, txn = Map("q1" -> 5L))
    }
    assert(e.appId == "q1" && e.batchId == 5L)
    assert(rm.read(rel).count() == 2, "the replayed epoch must not double-append")
    // a later epoch from the same writer proceeds normally
    rm.appendTable(Seq((3L, "c")).toDF("id", "v"), rel, txn = Map("q1" -> 6L))
    assert(rm.read(rel).count() == 3)
  }

  test("readCommitChanges: empty interval yields an empty typed frame, not a crash") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "cdf", "empty_feed")
    seed(rm, rel, 10, 1)
    val v = rm.currentVersion(rel).get
    val feed = rm.readCommitChanges(rel, v, v)
    assert(feed.count() == 0)
    assert(feed.columns.contains("_change_type") && feed.columns.contains("_commit_version"))
  }

  test("vacuum reclaims change dirs of truncated commits, keeps referenced ones") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "cdf", "vacuum_dirs")
    seed(rm, rel, 100, 2)
    Materializations.mergeInto(rm, rel, Seq((1L, "m1")).toDF("id", "v"),
      Seq("id"), updateColumns = Nil, storeChanges = true)       // stored (old)
    Materializations.mergeInto(rm, rel, Seq((2L, "m2")).toDF("id", "v"),
      Seq("id"), updateColumns = Nil, storeChanges = true)       // stored (kept)
    val changesRoot = java.nio.file.Paths.get(rm.path(rel)).resolve("_graft_changes")
    assert(Files.list(changesRoot).count() == 2)

    // keep only the latest version (v3 = second merge): the first merge's
    // delta (v2) truncates, so its change dir is unreferenced and must be
    // reclaimed; the second merge's delta survives, so its dir stays
    rm.vacuum(rel, keepVersions = 1)
    assert(Files.list(changesRoot).count() == 1,
      "unreferenced change dir must be reclaimed, referenced one kept")
    val v = rm.currentVersion(rel).get
    // the retained commit's stored feed still reads
    assert(rm.readCommitChanges(rel, v - 1, v)
      .filter($"_change_type" === "insert").as[(Long, String, String, Int)]
      .collect().map(_._1).toSeq == Seq(2L))
  }
}
