package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Relation
import graft.relations.RelationManager

/** Merge-on-read row-level operations (`row_level_mode = merge-on-read`):
  * SQL DML writes positional delete files instead of rewriting data files
  * — O(delta) bytes per statement — readers anti-merge the positions out,
  * and OPTIMIZE folds the deletes back into clean files. */
class MergeOnReadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A padded table: 3 range files × 10k rows with a 200-char column, so
    * file bytes dominate and the O(delta)-vs-O(file) assertion has teeth. */
  private def padded(rm: RelationManager, rel: Relation): Unit = {
    import spark.implicits._
    val pad = "x" * 200
    rm.writeTable((0 until 30000).map(i => (i.toLong, s"v$i", pad))
      .toDF("id", "v", "pad").repartitionByRange(3, $"id"),
      rel, statsCols = Seq("id"))
    rm.setTableProperties(rel, Map("row_level_mode" -> "merge-on-read"))
  }

  private def mor(name: String): (RelationManager, Relation, String) = {
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_mor").toString)
    val rel = Relation("graft", "main", name)
    padded(rm, rel)
    (rm, rel, s"${rm.catalogName}.main.$name")
  }

  private def bytesOf(rm: RelationManager, rel: Relation, files: Seq[String]): Long =
    files.map(f => Files.size(java.nio.file.Paths.get(rm.path(rel)).resolve(f))).sum

  test("UPDATE writes O(delta) bytes: no data file rewritten, tiny delete + insert files") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_upd")
    val before = rm.currentState(rel).get
    assert(before.files.size == 3 && before.deletes.isEmpty)

    spark.sql(s"UPDATE $t SET v = 'updated' WHERE id = 7")

    val after = rm.currentState(rel).get
    assert(before.files.forall(after.files.contains),
      "merge-on-read UPDATE must not remove any data file")
    val added = after.files.filterNot(before.files.toSet)
    val deleteFiles = after.deletes.values.flatten.toSeq.distinct
    assert(after.deletes.size == 1, s"one data file touched: ${after.deletes}")
    assert(deleteFiles.size == 1)
    val deltaBytes = bytesOf(rm, rel, added ++ deleteFiles)
    val smallestData = before.files.map(f => Files.size(java.nio.file.Paths.get(rm.path(rel)).resolve(f))).min
    assert(deltaBytes < smallestData / 4,
      s"one-row UPDATE must be O(delta): wrote $deltaBytes bytes vs " +
        s"smallest data file $smallestData")

    // read-side merge: exact rows, no duplicates, no resurrection
    assert(rm.read(rel).count() == 30000)
    assert(rm.read(rel).filter($"id" === 7L).select("v").as[String].collect().toSeq ==
      Seq("updated"))
    assert(spark.sql(s"SELECT v FROM $t WHERE id = 7").as[String].head() == "updated")
  }

  test("DELETE and stacked DML accumulate delete files; reads stay exact") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_stack")
    spark.sql(s"DELETE FROM $t WHERE id IN (5, 15000, 29999)")
    assert(rm.read(rel).count() == 29997)
    spark.sql(s"UPDATE $t SET v = 'u1' WHERE id = 6")
    spark.sql(s"UPDATE $t SET v = 'u2' WHERE id = 6") // updates the re-insert
    val st = rm.currentState(rel).get
    assert(st.deletes.nonEmpty)
    assert(rm.read(rel).count() == 29997)
    assert(rm.read(rel).filter($"id" === 6L).select("v").as[String].collect().toSeq ==
      Seq("u2"), "a re-inserted row must itself be updatable")
    assert(rm.read(rel).filter($"id" === 5L).isEmpty)
    // aggregate pushdown must NOT answer from (over-counting) stats
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 29997L)
    assert(spark.read.format("graft").load(rm.path(rel).toString).count() == 29997L)
  }

  test("MERGE INTO on merge-on-read: updates as delete+insert, inserts appended") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_merge")
    Seq((3L, "m3", "p"), (30005L, "new", "p")).toDF("id", "v", "pad")
      .createOrReplaceTempView("mor_merge_src")
    spark.sql(
      s"""MERGE INTO $t g USING mor_merge_src s ON g.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v, pad) VALUES (s.id, s.v, s.pad)
         |""".stripMargin)
    assert(rm.read(rel).count() == 30001)
    assert(rm.read(rel).filter($"id" === 3L).select("v").as[String].head() == "m3")
    assert(rm.read(rel).filter($"id" === 30005L).count() == 1)
    val st = rm.currentState(rel).get
    assert(st.deletes.nonEmpty, "matched update must write positional deletes")
  }

  test("optimize folds deletes away and restores clean files; time travel and vacuum compose") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_fold")
    val v1 = rm.currentVersion(rel).get
    spark.sql(s"DELETE FROM $t WHERE id = 100")
    spark.sql(s"UPDATE $t SET v = 'upd' WHERE id = 200")
    assert(rm.currentState(rel).get.deletes.nonEmpty)
    assert(rm.read(rel).count() == 29999)

    // time travel: pre-DML version still reads clean
    assert(rm.readAt(rel, v1).count() == 30000)

    rm.optimize(rel)
    val st = rm.currentState(rel).get
    assert(st.deletes.isEmpty, s"optimize must fold deletes: ${st.deletes}")
    assert(rm.read(rel).count() == 29999)
    assert(rm.read(rel).filter($"id" === 200L).select("v").as[String].head() == "upd")
    assert(rm.read(rel).filter($"id" === 100L).isEmpty)

    // vacuum reclaims the folded delete files and old data files
    rm.vacuum(rel)
    val delDir = java.nio.file.Paths.get(rm.path(rel)).resolve("_graft_deletes")
    val leftover =
      if (Files.isDirectory(delDir)) Files.list(delDir).count() else 0L
    assert(leftover == 0L, s"vacuum must reclaim folded delete files ($leftover left)")
    assert(rm.read(rel).count() == 29999)
  }

  test("engine merge composes with connector deletes (readFiles applies them)") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_engine")
    spark.sql(s"DELETE FROM $t WHERE id = 10")
    // engine-side MERGE must read through the delete-aware path: if it read
    // raw parquet it would resurrect id=10 into the rewritten file
    graft.materializations.Materializations.mergeInto(rm, rel,
      Seq((11L, "merged", "p")).toDF("id", "v", "pad"),
      Seq("id"), updateColumns = Nil)
    assert(rm.read(rel).filter($"id" === 10L).isEmpty,
      "engine rewrite must not resurrect positionally-deleted rows")
    assert(rm.read(rel).filter($"id" === 11L).select("v").as[String].head() == "merged")
    assert(rm.read(rel).count() == 29999)
  }

  test("_file and _pos metadata columns serve row identities") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_meta")
    val ids = spark.sql(s"SELECT _file, _pos, id FROM $t WHERE id < 3 ORDER BY id")
      .collect()
    assert(ids.length == 3)
    assert(ids.forall(r => r.getString(0).nonEmpty && r.getLong(1) >= 0))
    // positions are distinct within a file
    val perFile = ids.groupBy(_.getString(0)).values
    assert(perFile.forall(rows => rows.map(_.getLong(1)).distinct.length == rows.length))
  }

  test("readRowChanges is exact across merge-on-read commits (deletes from carried files surface)") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_cdc")
    val v1 = rm.currentVersion(rel).get
    spark.sql(s"UPDATE $t SET v = 'updated' WHERE id = 7")
    spark.sql(s"DELETE FROM $t WHERE id = 9")
    val v3 = rm.currentVersion(rel).get
    val changes = rm.readRowChanges(rel, v1, v3)
      .select($"id", $"v", $"_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(changes == Set(
      (7L, "v7", "delete"), (7L, "updated", "insert"),
      (9L, "v9", "delete")), changes.toString)
  }

  test("readRowChanges null-fills a column added after a delta commit (V2 route honors the schema override)") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_addcol_cdc")
    spark.sql(s"DELETE FROM $t WHERE id = 5") // v2: file gains positional deletes
    val v2 = rm.currentVersion(rel).get
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (extra STRING)") // v3: schema-only
    rm.optimize(rel) // v4: folds deletes — REMOVES the delete-carrying files
    val v4 = rm.currentVersion(rel).get
    // the from-side read (removed files, deletes live at v2) runs under the
    // TO schema (readRowChanges passes from.copy(schema = to.schema)); the
    // connector resolves v2's own schema, which lacks `extra` — it must
    // null-fill like the raw-parquet route, not throw on the select. The
    // rewrite carried every row, so the net feed is empty.
    val feed = rm.readRowChanges(rel, v2, v4)
    assert(feed.schema.fieldNames.contains("extra"))
    assert(feed.count() == 0, "optimize carries every row — the diff must cancel")
  }

  test("file-granular change feed fails loudly on merge-on-read commits (no silent no-change)") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_feed")
    val v1 = rm.currentVersion(rel).get
    spark.sql(s"DELETE FROM $t WHERE id = 3")
    val e = intercept[Exception] {
      spark.read.format("graft").option("readChangeFeed", "true")
        .option("startingVersion", v1 + 1).load(rm.path(rel).toString).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => y.getMessage +: msgs(y.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("readRowChanges")), e.toString)
  }

  test("merge-on-read DML on a partitioned+bucketed table keeps the layout") {
    import spark.implicits._
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_mor").toString)
    val rel = Relation("graft", "main", "mor_layout")
    rm.writeTable((0 until 2000).map(i => (i.toLong, s"v$i", s"p${i % 2}"))
      .toDF("id", "v", "p"), rel, partitionBy = Seq("p"),
      statsCols = Seq("id"), bucketBy = Seq("id"), buckets = 4)
    rm.setTableProperties(rel, Map("row_level_mode" -> "merge-on-read"))
    val t = s"${rm.catalogName}.main.mor_layout"
    val before = rm.currentState(rel).get

    spark.sql(s"UPDATE $t SET v = 'u' WHERE id IN (5, 6)")
    val after = rm.currentState(rel).get
    assert(before.files.forall(after.files.contains))
    val added = after.files.filterNot(before.files.toSet)
    assert(added.nonEmpty && added.forall(f =>
      f.contains("p=") && f.contains("_bucket=")),
      s"re-inserts must route through partition+bucket layout: $added")
    assert(rm.read(rel).count() == 2000)
    assert(rm.read(rel).filter($"id" === 5L).select("v").as[String].head() == "u")
    // a PURE DELETE's delta write carries an EMPTY write schema — the
    // insert-side factory must not resolve layout columns against it
    // (r17 fix: MoR DELETE on any bucketed/partitioned store crashed
    // with FIELD_NOT_FOUND before writing a single delete position,
    // found by the retrieval_gc_mor probe leg)
    spark.sql(s"DELETE FROM $t WHERE id % 10 = 3")
    val afterDel = rm.currentState(rel).get
    assert(after.files.forall(afterDel.files.contains),
      "MoR DELETE must rewrite no data file")
    assert(afterDel.deletes.nonEmpty && rm.read(rel).count() == 1800)
    // fold + verify layout intact
    rm.optimize(rel)
    assert(rm.currentState(rel).get.deletes.isEmpty)
    assert(rm.read(rel).count() == 1800)
    assert(rm.currentState(rel).get.files.forall(f =>
      f.contains("p=") && f.contains("_bucket=")),
      "optimize must restore clean files inside the declared layout")
  }

  test("racing same-row UPDATEs never duplicate the row (delete-attachment conflict check)") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val (rm, rel, t) = mor("mor_race")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      (0 until 5).foreach { round =>
        // two UPDATEs of the SAME row race: without the base-state delete
        // validation both would commit — each deletes the ORIGINAL
        // position and inserts its own copy, duplicating the row
        val a = Future(try spark.sql(s"UPDATE $t SET v = 'a$round' WHERE id = 42")
          catch { case _: Throwable => () })
        val b = Future(try spark.sql(s"UPDATE $t SET v = 'b$round' WHERE id = 42")
          catch { case _: Throwable => () })
        Await.result(a.zip(b), 120.seconds)
        val rows = rm.read(rel).filter($"id" === 42L)
          .select("v").as[String].collect().toSeq
        assert(rows.length == 1,
          s"round $round: racing updates duplicated the row: $rows")
        assert(rm.read(rel).count() == 30000, s"round $round: row count drifted")
      }
    } finally pool.shutdown()
  }

  test("a rewrite planned before a delta commit aborts instead of resurrecting deleted rows") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_rewrite_race")
    val st = rm.currentState(rel).get
    // a rewrite (merge/optimize shape) plans against `st`, reading file
    // rows under st's (empty) delete state...
    val victim = st.files.head
    val replacement = rm.readFiles(rel, st, Seq(victim))
    // ...then a DELTA commit mutates a row of that file without replacing
    // it — the file list is unchanged, so the old vanished-file check
    // passes and the stale rewrite would resurrect the deleted position
    spark.sql(s"DELETE FROM $t WHERE id = 0") // id 0 lives in the first range file
    assert(rm.currentState(rel).get.deletes.contains(victim),
      "precondition: the delta commit attached deletes to the planned file")
    intercept[java.util.ConcurrentModificationException] {
      rm.commitReplace(replacement, rel, Seq(victim), basedOn = Some(st))
    }
    // the abort preserved the delta commit's effect
    assert(rm.read(rel).filter($"id" === 0L).isEmpty)
    assert(rm.read(rel).count() == 29999)
  }

  test("auto-compaction: crossing the dead/live ratio folds deletes on the DML commit itself") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_autofold")
    // below every bound: a one-row update keeps its positional deletes
    spark.sql(s"UPDATE $t SET v = 'one' WHERE id = 1")
    assert(rm.currentState(rel).get.deletes.nonEmpty,
      "a 1/10000 update must NOT trigger a fold (ratio 0.1 default)")
    // a hot row updated again kills its whole 1-row insert file (ratio
    // 1.0) — the min_rows floor must keep that from thrashing a fold
    spark.sql(s"UPDATE $t SET v = 'one2' WHERE id = 1")
    assert(rm.currentState(rel).get.deletes.nonEmpty,
      "hot-row churn on tiny insert files must not trigger the ratio bound")
    // one statement kills >10% of the first range file's rows -> the
    // commit's post-hook folds EVERY dirty file, no operator optimize
    spark.sql(s"UPDATE $t SET v = 'bulk' WHERE id < 1500")
    val st = rm.currentState(rel).get
    assert(st.deletes.isEmpty,
      s"crossing delete_compaction_ratio must auto-fold: ${st.deletes}")
    // data intact, updates visible
    assert(rm.read(rel).count() == 30000)
    assert(rm.read(rel).filter($"id" === 1L).select("v").as[String].head() == "bulk")
    assert(rm.read(rel).filter($"id" === 1400L).select("v").as[String].head() == "bulk")
    assert(rm.read(rel).filter($"id" === 20000L).select("v").as[String].head() == "v20000")
    // scans are columnar again and stats pushdowns re-enable (clean table)
    val plan = spark.read.format("graft").load(rm.path(rel))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"auto-fold must restore the vectorized path:\n$plan")
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 30000L)
  }

  test("auto-compaction: the per-file delete-file COUNT bound folds update-heavy sequences") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_autofold_cnt")
    // tighten the count bound, neutralize the ratio bound - the trigger
    // under test is accumulation of many small DML statements
    rm.setTableProperties(rel, Map(
      "delete_compaction_max_delete_files" -> "3",
      "delete_compaction_ratio" -> "1000"))
    spark.sql(s"UPDATE $t SET v = 'u1' WHERE id = 1")
    spark.sql(s"UPDATE $t SET v = 'u2' WHERE id = 2")
    assert(rm.currentState(rel).get.deletes.values.flatten.size == 2,
      "two statements stay under the bound of 3")
    spark.sql(s"UPDATE $t SET v = 'u3' WHERE id = 3") // third attachment on file 0
    val st = rm.currentState(rel).get
    assert(st.deletes.isEmpty, s"third delete file must trigger the fold: ${st.deletes}")
    assert(rm.read(rel).count() == 30000)
    assert(rm.read(rel).filter($"id".isin(1L, 2L, 3L)).select("v")
      .as[String].collect().toSet == Set("u1", "u2", "u3"))
  }

  test("auto-compaction trigger is metadata-only: zero delete-file reads, counts ride the manifest") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_meta_trigger")
    val scans0 = org.apache.spark.sql.graft.source.GraftAutoCompact.deleteFileScans.get()
    // several no-trigger DML commits: each evaluates the ratio bound, and
    // every evaluation must come from the manifest's add_delete_rows —
    // never a re-read of the accumulated delete files (VERDICT r6 #4)
    spark.sql(s"UPDATE $t SET v = 'a' WHERE id = 11")
    spark.sql(s"UPDATE $t SET v = 'b' WHERE id = 12")
    spark.sql(s"DELETE FROM $t WHERE id = 13")
    val st = rm.currentState(rel).get
    assert(st.deletes.nonEmpty, "precondition: deletes accumulated, no fold")
    assert(org.apache.spark.sql.graft.source.GraftAutoCompact.deleteFileScans.get() == scans0,
      "no-trigger evaluation must not read any delete file")
    // the manifest carries exact dead-row counts per touched data file
    assert(st.deleteRows.values.sum == 3L,
      s"three dead positions must be recorded: ${st.deleteRows}")
    assert(st.deleteRows.keySet == st.deletes.keySet,
      "every delete-carrying file has a recorded count")
    // counts follow the deletes lifecycle: a fold drops both
    rm.optimize(rel, smallFileBytes = 0L)
    val folded = rm.currentState(rel).get
    assert(folded.deletes.isEmpty && folded.deleteRows.isEmpty,
      s"fold must clear counts with attachments: ${folded.deleteRows}")
    assert(rm.read(rel).count() == 29999)
  }

  test("auto-compaction backfills pre-r8 manifests: the legacy delete-file scan runs at most once") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_upgrade")
    spark.sql(s"UPDATE $t SET v = 'legacy' WHERE id = 21")
    val st0 = rm.currentState(rel).get
    assert(st0.deleteRows.nonEmpty, "precondition: current-format commit records counts")
    // forge a pre-r8 history in place: strip add_delete_rows from the DML
    // delta — byte-for-byte what the r7 serializer emitted for the same
    // statement (an upgraded-in-place deployment's log)
    val delta = java.nio.file.Paths.get(rm.path(rel))
      .resolve("_graft_log").resolve(f"v${st0.version}%08d.json")
    val txt = Files.readString(delta)
    assert(txt.contains("add_delete_rows"))
    Files.writeString(delta, txt.replaceAll(""""add_delete_rows":\{[^}]*\},""", ""))
    assert(rm.currentState(rel).get.deleteRows.isEmpty, "precondition: legacy manifest")

    val scans0 = org.apache.spark.sql.graft.source.GraftAutoCompact.deleteFileScans.get()
    // a no-trigger DML on a DIFFERENT data file evaluates the ratio bound:
    // the legacy file is footer-counted ONCE and the counts are written
    // back into the manifest as a metadata-only commit
    spark.sql(s"UPDATE $t SET v = 'a' WHERE id = 25001")
    assert(org.apache.spark.sql.graft.source.GraftAutoCompact.deleteFileScans.get() > scans0,
      "the first evaluation on an upgraded table pays the legacy scan")
    val scans1 = org.apache.spark.sql.graft.source.GraftAutoCompact.deleteFileScans.get()
    val st1 = rm.currentState(rel).get
    assert(st1.deleteRows.keySet == st1.deletes.keySet,
      s"backfill must cover every attached file: ${st1.deleteRows} vs ${st1.deletes.keySet}")
    // second evaluation: counts ride the manifest now — zero delete-file reads
    spark.sql(s"UPDATE $t SET v = 'b' WHERE id = 25002")
    assert(org.apache.spark.sql.graft.source.GraftAutoCompact.deleteFileScans.get() == scans1,
      "an upgraded table must never pay the legacy scan twice")
    assert(rm.currentState(rel).get.deletes.nonEmpty, "no fold (bounds not crossed)")
    assert(rm.read(rel).filter($"id" === 21L).select("v").as[String].head() == "legacy")
    assert(rm.read(rel).count() == 30000)
  }

  test("auto-compaction: delete_compaction=false disables folding entirely") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_autofold_off")
    rm.setTableProperties(rel, Map("delete_compaction" -> "false"))
    spark.sql(s"UPDATE $t SET v = 'bulk' WHERE id < 5000") // way past every bound
    assert(rm.currentState(rel).get.deletes.nonEmpty,
      "disabled auto-compaction must leave the deletes in place")
    assert(rm.read(rel).count() == 30000)
    assert(rm.read(rel).filter($"id" === 10L).select("v").as[String].head() == "bulk")
  }

  test("clean tables keep vectorized scans; dirty tables row-mode; optimize restores") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_vec")
    val dir = rm.path(rel).toString
    def planOf() = spark.read.format("graft").load(dir)
      .queryExecution.executedPlan.toString
    // clean: the connector scan feeds columnar batches (ColumnarToRow)
    assert(planOf().contains("ColumnarToRow"),
      s"clean graft scans must stay vectorized:\n${planOf()}")
    spark.sql(s"DELETE FROM $t WHERE id = 1")
    assert(!planOf().contains("ColumnarToRow"),
      "a dirty table must row-mode the scan (positional anti-merge)")
    rm.optimize(rel)
    assert(planOf().contains("ColumnarToRow"),
      "optimize must restore the vectorized path")
  }

  test("connector time travel reads each version with ITS delete state") {
    import spark.implicits._
    val (rm, rel, t) = mor("mor_tt")
    val v1 = rm.currentVersion(rel).get
    spark.sql(s"DELETE FROM $t WHERE id = 5")
    val v2 = rm.currentVersion(rel).get
    spark.sql(s"UPDATE $t SET v = 'u' WHERE id = 6")
    val dir = rm.path(rel).toString
    def at(v: Int) = spark.read.format("graft")
      .option("versionAsOf", v.toString).load(dir)
    assert(at(v1).count() == 30000)
    assert(at(v1).filter($"id" === 5L).count() == 1)
    assert(at(v2).count() == 29999)
    assert(at(v2).filter($"id" === 5L).count() == 0)
    assert(at(v2).filter($"id" === 6L).select("v").as[String].head() == "v6")
    val cur = spark.read.format("graft").load(dir)
    assert(cur.filter($"id" === 6L).select("v").as[String].head() == "u")
    assert(cur.count() == 29999)
  }

  test("attaching deletes to a concurrently-replaced file aborts the commit") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_mor_cas").resolve("_graft_log").toString
    val log = new graft.relations.CommitLog(new graft.relations.LocalFileStore, dir)
    val schema = StructType(Seq(StructField("id", LongType)))
    log.commit(None, Some(Nil), Some(schema), Some(Nil), Map.empty)(_ :+ "f1")
    // f1 vanishes (compacted away) before the delete attachment commits
    log.commit(None, None, None, None, Map.empty)(_.filterNot(_ == "f1") :+ "f2")
    intercept[java.util.ConcurrentModificationException] {
      log.commit(None, None, None, None, Map.empty,
        addedDeletes = Map("f1" -> Seq("_graft_deletes/d1.parquet")))(identity)
    }
  }
}
