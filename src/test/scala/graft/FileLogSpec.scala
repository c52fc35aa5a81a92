package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.materializations.Materializations
import graft.relations.RelationManager

/** Commit-log table format (VERDICT r2 next-round #3): versioned
  * manifest-of-files per table — O(touched-files) MERGE, snapshot
  * isolation, time travel, vacuum. */
class FileLogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def newRm() = new RelationManager(spark, Files.createTempDirectory("graft_log").toString)

  private def rangedTable(rm: RelationManager, rel: Relation, n: Int, files: Int) = {
    import spark.implicits._
    // range-partitioned layout: each file covers a contiguous id range, so
    // a narrow-key merge demonstrably touches few files
    val df = (0 until n).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartitionByRange(files, $"id")
    rm.writeTable(df, rel, statsCols = Seq("id"))
  }

  test("1% merge rewrites ~1% of files, untouched files stay referenced byte-identical") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "log", "merge_pruned")
    rangedTable(rm, rel, 10000, 50)
    val before = rm.currentState(rel).get
    assert(before.files.size == 50, s"expected 50 files, got ${before.files.size}")

    // source touches ids 0..99 → a single range file (plus 10 new inserts)
    val src = ((0 until 100).map(i => (i.toLong, "updated")) ++
      (10000 until 10010).map(i => (i.toLong, "new"))).toDF("id", "v")
    Materializations.mergeInto(rm, rel, src, Seq("id"), updateColumns = Nil)

    val after = rm.currentState(rel).get
    val kept = before.files.toSet intersect after.files.toSet
    assert(kept.size >= 48, s"untouched files must stay referenced: kept ${kept.size}/50")
    assert((before.files.toSet -- after.files.toSet).size <= 2,
      "a 1% merge must not rewrite the table")
    // correctness of the pruned rewrite
    val out = rm.read(rel)
    assert(out.count() == 10010)
    assert(out.filter($"v" === "updated").count() == 100)
    assert(out.filter($"v" === "new").count() == 10)
    assert(out.filter($"id" === 5000L && $"v" === "v5000").count() == 1)
  }

  test("string-key merge with supplementary characters is never wrongly pruned") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "log", "utf8_order")
    // U+FFFF sorts BEFORE U+1F600 in UTF-8 bytes (Spark's string order)
    // but AFTER it in Java's UTF-16 char order — stats min/max come from
    // Spark, so pruning must compare UTF-8-binary or the file whose max
    // is the emoji gets pruned for a U+FFFF key and the merge duplicates
    val high = "￿"
    val emoji = "😀" // U+1F600
    rm.writeTable(Seq((high, "a"), (emoji, "b")).toDF("k", "v"), rel,
      statsCols = Seq("k"))
    Materializations.mergeInto(rm, rel, Seq((high, "updated")).toDF("k", "v"),
      Seq("k"), updateColumns = Nil)
    val out = rm.read(rel).as[(String, String)].collect().toMap
    assert(out.size == 2, s"wrong pruning duplicated a key: $out")
    assert(out(high) == "updated" && out(emoji) == "b")
    // the ordering itself agrees with Spark's binary collation
    val ord = graft.relations.Stats.ordering(
      org.apache.spark.sql.types.StringType).get
    assert(ord.lt(high, emoji), "stats ordering must be UTF-8 binary")
  }

  test("zero-row staged files are dropped and never poison stats coverage") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "log", "zero_rows")
    rm.writeTable(Seq((1L, "a")).toDF("id", "v"), rel, statsCols = Seq("id"))
    // append an EMPTY frame: its schema-only parquet file must either be
    // dropped or carry rows=0 stats — never a stat-less manifest entry
    // that disables full-coverage COUNT/LIMIT pushdowns forever
    rm.appendTable(Seq.empty[(Long, String)].toDF("id", "v"), rel)
    val st = rm.currentState(rel).get
    assert(st.files.forall(f => st.stats.get(f).exists(_.contains("id"))),
      s"every manifest file needs stats: ${st.stats}")
    assert(rm.read(rel).count() == 1)
    // the connector's stats-answered COUNT still engages
    val cnt = spark.read.format("graft").load(rm.path(rel).toString)
      .groupBy().count()
    cnt.collect()
    assert(cnt.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "full stats coverage must keep the metadata COUNT pushdown alive:\n" +
        cnt.queryExecution.executedPlan)
  }

  test("delete+insert is file-pruned too") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "log", "di_pruned")
    rangedTable(rm, rel, 10000, 50)
    val before = rm.currentState(rel).get
    val src = (0 until 100).map(i => (i.toLong, "replaced")).toDF("id", "v")
    Materializations.deleteInsert(rm, rel, src, Seq("id"))
    val after = rm.currentState(rel).get
    assert((before.files.toSet intersect after.files.toSet).size >= 48)
    assert(rm.read(rel).count() == 10000)
    assert(rm.read(rel).filter($"v" === "replaced").count() == 100)
  }

  test("snapshot run changing 1 of 10000 keys rewrites ~1 file") {
    import spark.implicits._
    import graft.materializations.Snapshot
    val rm = newRm()
    val rel = Relation("graft", "log", "snap_pruned")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val src1 = (0 until 10000).map(i => (i.toLong, s"v$i", t1))
      .toDF("id", "v", "updated_at").repartitionByRange(50, $"id")
    Snapshot(rm, rel, src1, Seq("id"), Snapshot.TimestampStrategy("updated_at"))
    val before = rm.currentState(rel).get
    assert(before.files.size >= 45, s"want ~50 files, got ${before.files.size}")

    // second run: only key 5000 changed
    val src2 = (0 until 10000).map(i =>
      if (i == 5000) (i.toLong, "CHANGED", t2) else (i.toLong, s"v$i", t1))
      .toDF("id", "v", "updated_at")
    Snapshot(rm, rel, src2, Seq("id"), Snapshot.TimestampStrategy("updated_at"))
    val after = rm.currentState(rel).get
    val kept = before.files.toSet intersect after.files.toSet
    assert(kept.size >= before.files.size - 1,
      s"1-key snapshot must touch ~1 file: kept ${kept.size}/${before.files.size}")
    // SCD-2 semantics intact
    val snap = rm.read(rel)
    assert(snap.count() == 10001)
    val k5000 = snap.filter($"id" === 5000L).orderBy("dbt_valid_from").collect()
    assert(k5000.length == 2)
    assert(k5000(0).getAs[java.sql.Timestamp]("dbt_valid_to") != null)
    assert(k5000(1).getAs[java.sql.Timestamp]("dbt_valid_to") == null)
    assert(k5000(1).getAs[String]("v") == "CHANGED")
    assert(snap.filter($"dbt_valid_to".isNull).count() == 10000)
  }

  test("per-file stats prune the MERGE planning scan to candidate files (VERDICT r3 #1)") {
    import spark.implicits._
    import graft.relations.Stats
    val rm = newRm()
    val rel = Relation("graft", "log", "stats_pruned")
    rangedTable(rm, rel, 10000, 50)
    val st = rm.currentState(rel).get
    // stats recorded for every file
    assert(st.statsCols == Seq("id"))
    assert(st.stats.size == 50)
    assert(st.stats.values.forall(_.contains("id")))

    // a narrow-key batch's bounds must drop almost every file BEFORE any
    // data is read — the planning scan then opens only the survivors
    val src = (0 until 100).map(i => (i.toLong, "u")).toDF("id", "v")
    val bounds = Stats.keyBounds(src.select("id"), Seq("id")).get
    val candidates = Stats.candidateFiles(st, bounds)
    assert(candidates.size <= 3,
      s"stats must prune a [0,99] batch to ~1 of 50 range files, got ${candidates.size}")

    // and the pruned merge is still exactly right
    Materializations.mergeInto(rm, rel, src, Seq("id"), updateColumns = Nil)
    assert(rm.read(rel).filter($"v" === "u").count() == 100)
    assert(rm.read(rel).count() == 10000)

    // appended files keep recording stats under the table's statsCols
    rm.appendTable((20000 until 20010).map(i => (i.toLong, "a")).toDF("id", "v"), rel)
    val st2 = rm.currentState(rel).get
    assert(st2.stats.size == st2.files.size,
      "appends must carry per-file stats like the CTAS did")
    val afterBounds = Stats.keyBounds(
      Seq(20005L).toDF("id"), Seq("id")).get
    assert(Stats.candidateFiles(st2, afterBounds).size <= 2)
  }

  test("optimize bin-packs small files, leaves content identical, keeps time travel") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "log", "opt_pack")
    // 20 tiny appends → 20+ small files
    rm.writeTable((0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"), rel,
      statsCols = Seq("id"))
    (1 until 20).foreach { b =>
      rm.appendTable((b * 50 until (b + 1) * 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"), rel)
    }
    val before = rm.currentState(rel).get
    assert(before.files.size >= 20, s"want many small files, got ${before.files.size}")
    val beforeVersion = before.version
    val beforeRows = rm.read(rel).orderBy("id").collect().toSeq

    rm.optimize(rel)
    val after = rm.currentState(rel).get
    assert(after.files.size < before.files.size / 2,
      s"bin-pack must shrink the file count: ${before.files.size} -> ${after.files.size}")
    assert(after.stats.size == after.files.size, "packed files must carry stats")
    assert(rm.read(rel).orderBy("id").collect().toSeq == beforeRows,
      "optimize must not change table content")
    // pre-optimize version still readable (snapshot isolation / time travel)
    assert(rm.readAt(rel, beforeVersion).count() == 1000)
  }

  test("optimize cluster-by sharpens stats pruning to O(1) candidate files") {
    import spark.implicits._
    import graft.relations.Stats
    val rm = newRm()
    val rel = Relation("graft", "log", "opt_cluster")
    // adversarial layout: round-robin keys → every file spans ~the full id
    // range, so stats pruning can drop nothing
    val shuffled = (0 until 10000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(50) // random distribution, overlapping ranges
    rm.writeTable(shuffled, rel, statsCols = Seq("id"))
    val st0 = rm.currentState(rel).get
    val src = (0 until 100).map(i => (i.toLong, "u")).toDF("id", "v")
    val bounds = Stats.keyBounds(src.select("id"), Seq("id")).get
    val before = Stats.candidateFiles(st0, bounds).size
    assert(before >= st0.files.size / 2,
      s"unclustered layout should barely prune (got $before of ${st0.files.size})")

    rm.optimize(rel, clusterBy = Seq("id"))
    val st1 = rm.currentState(rel).get
    val after = Stats.candidateFiles(st1, bounds).size
    assert(after <= 3,
      s"clustered layout must prune a [0,99] batch to ~1 file, got $after of ${st1.files.size}")
    assert(rm.read(rel).count() == 10000)
    // the sharpened layout carries through a real merge
    Materializations.mergeInto(rm, rel, src, Seq("id"), updateColumns = Nil)
    val st2 = rm.currentState(rel).get
    assert((st1.files.toSet intersect st2.files.toSet).size >= st1.files.size - 2,
      "post-cluster merge must rewrite only the candidate files")
    assert(rm.read(rel).filter($"v" === "u").count() == 100)
  }

  test("empty merge source plans zero files") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "log", "empty_src")
    rangedTable(rm, rel, 1000, 10)
    val before = rm.currentState(rel).get.files.toSet
    Materializations.mergeInto(rm, rel,
      Seq.empty[(Long, String)].toDF("id", "v"), Seq("id"), updateColumns = Nil)
    assert(rm.currentState(rel).get.files.toSet == before)
    assert(rm.read(rel).count() == 1000)
  }

  test("snapshot history settles into history-only files the null-count prune skips") {
    import spark.implicits._
    import graft.materializations.Snapshot
    import graft.relations.Stats
    val rm = newRm()
    val rel = Relation("graft", "log", "snap_hist")
    def src(changedUpTo: Int, stamp: String) =
      (0 until 2000).map { i =>
        val changed = i < changedUpTo
        (i.toLong, if (changed) s"v-$stamp" else "v0",
          java.sql.Timestamp.valueOf(if (changed) stamp else "2024-01-01 00:00:00"))
      }.toDF("id", "v", "updated_at")
        .repartitionByRange(10, $"id")
    Snapshot(rm, rel, src(0, "2024-01-01 00:00:00"), Seq("id"),
      Snapshot.TimestampStrategy("updated_at"))
    // three runs each change a slice → history accumulates
    Seq("2024-02-01 00:00:00", "2024-03-01 00:00:00", "2024-04-01 00:00:00")
      .zipWithIndex.foreach { case (stamp, i) =>
        Snapshot(rm, rel, src(500 * (i + 1), stamp), Seq("id"),
          Snapshot.TimestampStrategy("updated_at"))
      }
    val st = rm.currentState(rel).get
    val currentBearing = Stats.filesWithNulls(st, "dbt_valid_to")
    assert(currentBearing.size < st.files.size,
      s"rewrite clustering must produce history-only files: " +
        s"${currentBearing.size}/${st.files.size} still current-bearing")
    // correctness: 2000 current + 500+1000+1500 closed versions
    assert(rm.read(rel).count() == 2000 + 3000)
    assert(rm.read(rel).filter($"dbt_valid_to".isNull).count() == 2000)
  }

  test("time travel: prior versions stay readable until vacuumed") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "log", "tt")
    rm.writeTable(Seq((1, "a"), (2, "b")).toDF("id", "v"), rel)
    val v1 = rm.currentVersion(rel).get
    rm.writeTable(Seq((3, "c")).toDF("id", "v"), rel)
    assert(rm.read(rel).count() == 1)
    assert(rm.readAt(rel, v1).orderBy("id").select("v").as[String].collect().toSeq == Seq("a", "b"))

    // vacuum keeps only the latest version's files
    val allBefore = Files.walk(java.nio.file.Paths.get(rm.path(rel))).filter(_.toString.endsWith(".parquet")).count()
    rm.vacuum(rel)
    val allAfter = Files.walk(java.nio.file.Paths.get(rm.path(rel))).filter(_.toString.endsWith(".parquet")).count()
    assert(allAfter < allBefore, "vacuum must delete unreferenced files")
    assert(rm.read(rel).select("v").as[String].collect().toSeq == Seq("c"))
  }

  test("truncate leaves a readable zero-row table with its schema") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "log", "trunc")
    rm.writeTable(Seq((1, "a")).toDF("id", "v"), rel)
    rm.truncate(rel)
    assert(rm.exists(rel))
    assert(rm.read(rel).count() == 0)
    assert(rm.read(rel).schema.fieldNames.toSeq == Seq("id", "v"))
  }

  test("append adds files without touching existing ones; concurrent appends both land") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "log", "app")
    rm.writeTable(Seq((1, "a")).toDF("id", "v"), rel)
    val base = rm.currentState(rel).get.files.toSet
    // two concurrent appenders: optimistic commit retry must make both
    // visible (snapshot isolation — neither clobbers the other's files)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (0 until 2).map(i => Future {
      rm.appendTable(Seq((10 + i, s"c$i")).toDF("id", "v"), rel)
    })
    Await.result(Future.sequence(fs), 120.seconds)
    val st = rm.currentState(rel).get
    assert(base.subsetOf(st.files.toSet))
    assert(rm.read(rel).count() == 3)
  }

  test("partitioned overwrite replaces only partitions present in the frame (plus alsoClear)") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "log", "po")
    val df = Seq(("p1", 1), ("p2", 2), ("p3", 3)).toDF("p", "x")
    rm.writeTable(df, rel, partitionBy = Seq("p"))
    val before = rm.currentState(rel).get.files.toSet
    // overwrite p2, clear p3, leave p1 untouched
    rm.overwritePartitions(Seq(("p2", 20)).toDF("p", "x"), rel, Seq("p"),
      alsoClear = Seq("p=p3"))
    val st = rm.currentState(rel).get
    assert(before.filter(_.startsWith("p=p1/")).subsetOf(st.files.toSet))
    val rows = rm.read(rel).orderBy("p").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rows == Seq(("p1", 1), ("p2", 20)))
  }

  test("txn watermarks survive checkpoint compaction and log truncation") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "main", "txn_ckpt")
    rm.writeTable(Seq((0L, "x")).toDF("id", "v"), rel)
    // push past the checkpoint interval (10) with txn-carrying appends
    (1 to 12).foreach { i =>
      rm.appendTable(Seq((i.toLong, s"v$i")).toDF("id", "v"), rel,
        txn = Map("writer_a" -> i.toLong, s"w$i" -> 0L))
    }
    assert(rm.currentState(rel).get.version == 13)
    assert(rm.lastTxn(rel, "writer_a").contains(12L))
    assert(rm.lastTxn(rel, "w3").contains(0L)) // merged from a pre-checkpoint delta
    // a FRESH manager (fresh log reads, checkpoint + tail replay) agrees
    val rm2 = new RelationManager(spark, rm.root)
    assert(rm2.lastTxn(rel, "writer_a").contains(12L))
    assert(rm2.lastTxn(rel, "w1").contains(0L))
  }

  test("readChanges scans exactly the files added between two versions") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "main", "chg")
    rm.writeTable(Seq((1L, "a")).toDF("id", "v"), rel) // v1
    rm.appendTable(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), rel) // v2
    rm.appendTable(Seq((4L, "d")).toDF("id", "v"), rel) // v3
    assert(rm.readChanges(rel, 0, 3).count() == 4) // everything
    assert(rm.readChanges(rel, 1, 3).orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(2L, 3L, 4L))
    assert(rm.readChanges(rel, 2, 3).collect().map(_.getLong(0)).toSeq == Seq(4L))
    assert(rm.readChanges(rel, 3, 3).isEmpty)
    // the feed's plan reads only the delta files, not the table
    val v1Files = rm.readVersion(rel, 1).files.toSet
    val plan = rm.readChanges(rel, 1, 3).queryExecution.sparkPlan.toString
    assert(!v1Files.exists(f => plan.contains(f.split('/').last)))
  }

  test("readRowChanges: merge emits exact row-level insert/delete pairs, carried rows cancel") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "log", "row_cdc")
    rangedTable(rm, rel, 1000, 10) // 100 rows per file
    val v0 = rm.currentState(rel).get.version

    // update 2 keys + insert 1 → the rewrite carries ~198 rows, but the
    // row feed must show exactly 2 deletes (pre-images) + 3 inserts
    val src = Seq((5L, "u5"), (250L, "u250"), (5000L, "new")).toDF("id", "v")
    Materializations.mergeInto(rm, rel, src, Seq("id"), updateColumns = Nil)
    val v1 = rm.currentState(rel).get.version

    val chg = rm.readRowChanges(rel, v0, v1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(chg == Set(
      (5L, "v5", "delete"), (250L, "v250", "delete"),
      (5L, "u5", "insert"), (250L, "u250", "insert"), (5000L, "new", "insert")),
      s"got $chg")

    // append-only interval → inserts only
    rm.appendTable(Seq((6000L, "a")).toDF("id", "v"), rel)
    val chg2 = rm.readRowChanges(rel, v1, v1 + 1).collect()
    assert(chg2.length == 1 && chg2(0).getString(2) == "insert")
  }

  test("merge incremental_predicates: excluded target rows never update (ON-clause semantics)") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "log", "merge_preds")
    rangedTable(rm, rel, 100, 2)
    // predicate excludes id >= 50 from matching — the reference's
    // §default__get_merge_sql joins predicates into the ON clause, so an
    // excluded row carries over even when its key appears in the source,
    // and that source row INSERTS (the documented user contract: predicates
    // must exclude rows source keys can't touch)
    Materializations.mergeInto(rm, rel,
      Seq((5L, "u5"), (60L, "u60")).toDF("id", "v"),
      Seq("id"), updateColumns = Nil,
      predicates = Seq(col("id") < 50))
    val byId = rm.read(rel).collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byId(5L) == Seq("u5"))           // matched + predicate → updated
    assert(byId(60L) == Seq("u60", "v60"))  // excluded → carried + source inserted
    assert(byId(49L) == Seq("v49"))         // untouched row intact
    assert(rm.read(rel).count() == 101)
  }

  test("expectedBase aborts a commit whose snapshot went stale (ALTER's conflict guard)") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_cas").resolve("_graft_log").toString
    val log = new graft.relations.CommitLog(new graft.relations.LocalFileStore, dir)
    val schema = StructType(Seq(StructField("id", LongType)))
    log.commit(None, Some(Nil), Some(schema), Some(Nil), Map.empty)(identity) // v1
    log.commit(None, None, None, None, Map.empty)(identity)                   // v2
    // a mutation derived from the v1 snapshot must NOT silently overwrite v2
    intercept[java.util.ConcurrentModificationException] {
      log.commit(None, None, Some(schema), None, Map.empty,
        expectedBase = Some(1))(identity)
    }
    // matching base commits fine
    val v3 = log.commit(None, None, Some(schema), None, Map.empty,
      expectedBase = Some(2))(identity)
    assert(v3.version == 3)
  }

  test("racing setTableProperties commits keep both sides' keys (read-merge CAS)") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "log", "props_race")
    rm.writeTable(Seq((1L, "a")).toDF("id", "v"), rel)
    // the merged props map derives from a snapshot read: without
    // expectedBase, a commit racing another property commit replays only
    // the file-list transform and silently drops the other side's keys
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      (0 until 10).foreach { round =>
        val a = Future(rm.setTableProperties(rel, Map(s"a$round" -> "1")))
        val b = Future(rm.setTableProperties(rel, Map(s"b$round" -> "2")))
        Await.result(Future.sequence(Seq(a, b)), 60.seconds)
        val props = rm.currentState(rel).get.props
        assert(props.contains(s"a$round") && props.contains(s"b$round"),
          s"round $round lost a key: $props")
      }
    } finally pool.shutdown()
  }

  test("LocalFileStore.moveFile: a publish retry whose src was already consumed succeeds") {
    val store = new graft.relations.LocalFileStore
    val dir = Files.createTempDirectory("graft_mv_retry")
    val src = dir.resolve("staged"); val dst = dir.resolve("final/part-0")
    Files.writeString(src, "bytes")
    store.moveFile(src.toString, dst.toString)
    assert(store.read(dst.toString) == "bytes")
    // retry of the SAME publish (names are write-unique): src gone, dst
    // present — the contract says success, matching the other two impls
    store.moveFile(src.toString, dst.toString)
    assert(store.read(dst.toString) == "bytes")
  }
}
