package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Relation
import graft.relations.RelationManager

/** V2 write path: graft commit-log tables writable from ANY Spark job —
  * INSERT INTO / INSERT OVERWRITE / CTAS / DELETE / TRUNCATE through the
  * catalog, df.write.format("graft") path-based — interleaving safely with
  * the engine's own writers on the same commit CAS. */
class V2WriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def newRm() = new RelationManager(spark, Files.createTempDirectory("graft_v2w").toString)

  test("path-based append and overwrite commit versions with per-file stats") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "main", "v2w_path")
    rm.writeTable(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), rel, statsCols = Seq("id"))
    val dir = rm.path(rel).toString

    Seq((3L, "c"), (4L, "d")).toDF("id", "v")
      .write.format("graft").mode("append").save(dir)
    assert(rm.read(rel).orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))

    // externally-written files carry manifest stats (data skipping intact)
    val st = rm.currentState(rel).get
    assert(st.version == 2)
    assert(st.files.forall(f => st.stats.get(f).exists(_.contains("id"))),
      s"external append must record id stats: ${st.stats}")
    // and the stats are RIGHT: a narrow filter prunes to a file subset
    val pruned = org.apache.spark.sql.graft.source.GraftSourceTable.skipByStats(
      st, Seq(org.apache.spark.sql.sources.EqualTo("id", 4L)))
    assert(pruned.size < st.files.size, s"stats must prune: $pruned of ${st.files}")

    Seq((9L, "z")).toDF("id", "v").write.format("graft").mode("overwrite").save(dir)
    assert(rm.read(rel).as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    // overwrite is a logical truncate: prior versions stay readable
    assert(rm.readAt(rel, 2).count() == 4)
  }

  test("INSERT INTO / INSERT OVERWRITE / CTAS through the catalog") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "main", "v2w_sql")
    rm.writeTable(Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "p"),
      rel, partitionBy = Seq("p"), statsCols = Seq("id"))
    val t = s"${rm.catalogName}.main.v2w_sql"

    spark.sql(s"INSERT INTO $t VALUES (3, 'c', 'y'), (4, 'd', 'z')")
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").as[Long].collect().toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // appended rows landed inside Hive partition dirs the manifest understands
    val st = rm.currentState(rel).get
    val newFiles = st.files.filterNot(rm.readVersion(rel, 1).files.toSet)
    assert(newFiles.nonEmpty && newFiles.forall(_.startsWith("p=")),
      s"expected partition-dir layout: $newFiles")
    assert(spark.sql(s"SELECT id FROM $t WHERE p = 'z'").as[Long].collect().toSeq == Seq(4L))

    // static INSERT OVERWRITE = logical truncate + write
    spark.sql(s"INSERT OVERWRITE $t VALUES (7, 'q', 'x')")
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 1L)
    assert(rm.readAt(rel, 2).count() == 4) // time travel across external writes

    // dynamic partition overwrite replaces only touched partitions
    spark.sql(s"INSERT INTO $t VALUES (8, 'r', 'w')")
    val mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(s"INSERT OVERWRITE $t VALUES (9, 's', 'x')")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode)
    assert(spark.sql(s"SELECT id, p FROM $t ORDER BY id").as[(Long, String)].collect().toSeq ==
      Seq((8L, "w"), (9L, "x")), "p=x replaced, p=w untouched")

    // CTAS: catalog createTable + V2 append in one statement
    spark.sql(s"CREATE TABLE ${rm.catalogName}.main.v2w_ctas AS SELECT id * 10 AS id FROM $t")
    assert(spark.sql(s"SELECT id FROM ${rm.catalogName}.main.v2w_ctas ORDER BY id")
      .as[Long].collect().toSeq == Seq(80L, 90L))
    assert(rm.currentState(Relation("graft", "main", "v2w_ctas")).isDefined)
  }

  test("INSERT INTO a bucketed table keeps bucket routing and shuffle-free joins") {
    import spark.implicits._
    val rm = newRm()
    val a = Relation("graft", "main", "v2w_bkt_a")
    val b = Relation("graft", "main", "v2w_bkt_b")
    val df = (0L until 100L).map(i => (i, s"a$i")).toDF("k", "va")
    rm.writeBucketedTable(df, a, buckets = 4, bucketCols = Seq("k"))
    rm.writeBucketedTable((0L until 100L).map(i => (i, s"b$i")).toDF("k", "vb"),
      b, buckets = 4, bucketCols = Seq("k"))

    val ta = s"${rm.catalogName}.main.v2w_bkt_a"
    spark.sql(s"INSERT INTO $ta VALUES (100, 'a100'), (101, 'a101'), (102, 'a102')")

    // inserted files carry bucket ids, and the routing matches the engine's
    val st = rm.currentState(a).get
    val newFiles = st.files.filterNot(rm.readVersion(a, 1).files.toSet)
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("_bucket=")), s"$newFiles")
    for (k <- Seq(100L, 101L, 102L)) {
      val expected = org.apache.spark.sql.graft.source.GraftBoundBucket(
        Seq(org.apache.spark.sql.types.LongType)).produceResult(
          org.apache.spark.sql.catalyst.InternalRow(4, k))
      val hit = rm.read(a).filter($"k" === k).count() == 1
      assert(hit, s"k=$k must be readable after insert")
      val inBucket = newFiles.filter(
        graft.relations.RelationManager.bucketIdOf(_).contains(expected.toInt))
      assert(inBucket.nonEmpty, s"k=$k expected in bucket $expected of $newFiles")
    }

    // the join is still storage-partitioned (no Exchange) after the insert
    val joined = rm.read(a).join(rm.read(b), "k")
    assert(joined.count() == 100 + 3 - 3) // keys 100..102 absent from b
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"SPJ must survive external inserts:\n$plan")
  }

  test("streaming write to a bucketed table emits one file per bucket per epoch") {
    import spark.implicits._
    val rm = newRm()
    val src = Relation("graft", "main", "v2w_bkt_ssrc")
    val dst = Relation("graft", "main", "v2w_bkt_sdst")
    rm.writeTable((0L until 200L).map(i => (i, s"s$i")).toDF("k", "v")
      .repartition(8), src)
    rm.writeBucketedTable((0L until 10L).map(i => (i, s"d$i")).toDF("k", "v"),
      dst, buckets = 4, bucketCols = Seq("k"))
    val before = rm.currentState(dst).get.files.toSet

    val q = graft.streaming.StreamingOps.readTableStream(rm, src)
      .writeStream.format("graft")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sbkt_ckpt").toString)
      .start(rm.path(dst).toString)
    try q.processAllAvailable() finally q.stop()

    val st = rm.currentState(dst).get
    val newFiles = st.files.filterNot(before)
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("_bucket=")), s"$newFiles")
    val perBucket = newFiles.groupBy(graft.relations.RelationManager.bucketIdOf)
    assert(perBucket.forall(_._2.size == 1),
      s"one file per bucket per epoch, got ${perBucket.view.mapValues(_.size).toMap}")
    assert(rm.read(dst).count() == 210)
    // routing matches the engine's bucketing: SPJ still holds
    val joined = rm.read(dst).join(rm.read(dst).select($"k"), "k")
    assert(joined.queryExecution.executedPlan.toString.contains("Exchange") == false)
  }

  test("path-based write to a bucketed table emits one file per bucket, not per task") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "main", "v2w_bkt_path")
    rm.writeBucketedTable((0L until 10L).map(i => (i, s"s$i")).toDF("k", "v"),
      rel, buckets = 4, bucketCols = Seq("k"))
    val dir = rm.path(rel).toString
    val before = rm.currentState(rel).get.files.toSet

    // 400 keys over 8 input partitions: without GraftPathWriteClustering
    // (the session-extension FunctionCatalog-gap closer) each task would
    // emit a file per bucket it sees — up to tasks × buckets files
    (100L until 500L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(8)
      .write.format("graft").mode("append").save(dir)

    val st = rm.currentState(rel).get
    val newFiles = st.files.filterNot(before)
    assert(newFiles.forall(_.contains("_bucket=")), s"$newFiles")
    val perBucket = newFiles.groupBy(graft.relations.RelationManager.bucketIdOf)
    assert(perBucket.keys.forall(_.isDefined))
    assert(perBucket.forall(_._2.size == 1),
      s"one file per bucket per write, got ${perBucket.view.mapValues(_.size).toMap}")
    assert(newFiles.size <= 4, s"at most one file per bucket: $newFiles")
    // rows all landed and route identically to the engine's bucketing
    assert(rm.read(rel).count() == 410)
    val joined = rm.read(rel).join(rm.read(rel).select($"k"), "k")
    assert(joined.count() == 410)
  }

  test("metadata-only DELETE drops whole files via partition values and stats") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "main", "v2w_del")
    rm.writeTable((0L until 1000L).map(i => (i, if (i < 500) "a" else "b")).toDF("id", "p")
      .repartitionByRange(4, $"id"), rel, partitionBy = Seq("p"), statsCols = Seq("id"))
    val t = s"${rm.catalogName}.main.v2w_del"
    val before = rm.currentState(rel).get

    // partition-value proof: every p='a' file drops, no data rewritten
    spark.sql(s"DELETE FROM $t WHERE p = 'a'")
    val after = rm.currentState(rel).get
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 500L)
    assert(after.files.toSet.subsetOf(before.files.toSet),
      "metadata delete must not write new files")

    // stats proof on a clustered column: id < 750 covers whole files only
    // if file ranges align; the range layout makes 500..749 its own file
    spark.sql(s"DELETE FROM $t WHERE id >= 750")
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 250L)
    assert(rm.currentState(rel).get.files.toSet.subsetOf(before.files.toSet))

    // a predicate stats can't prove all-or-nothing per file falls back to
    // the copy-on-write rewrite (DmlSpec) instead of failing
    spark.sql(s"DELETE FROM $t WHERE id % 2 = 0")
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 125L)

    // TRUNCATE TABLE: one metadata commit, history intact
    spark.sql(s"TRUNCATE TABLE $t")
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 0L)
    assert(rm.readAt(rel, before.version).count() == 1000L)
  }

  test("writeStream.format(graft): epochs append exactly once with txn watermarks") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "main", "v2w_stream")
    rm.writeTable(Seq((0L, "seed")).toDF("id", "v"), rel, statsCols = Seq("id"))
    val dir = rm.path(rel).toString
    val ckpt = Files.createTempDirectory("graft_v2ws_ckpt").toString

    val src = MemoryStream[(Long, String)]
    val q = src.toDF().toDF("id", "v").writeStream.format("graft")
      .option("checkpointLocation", ckpt).start(dir)
    src.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    src.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    assert(rm.read(rel).count() == 4)

    // the epoch watermark rode the commits atomically
    val st = rm.currentState(rel).get
    val wm = st.txn.collectFirst { case (k, v) if k.startsWith("graft-v2-stream:") => (k, v) }
    assert(wm.isDefined, s"expected a streaming watermark in ${st.txn}")
    // streamed files carry stats like any other write
    assert(st.files.forall(f => st.stats.get(f).exists(_.contains("id"))))

    // restart from the same checkpoint: same query id → same watermark key,
    // new data lands exactly once
    val q2 = src.toDF().toDF("id", "v").writeStream.format("graft")
      .option("checkpointLocation", ckpt).start(dir)
    src.addData((4L, "d"))
    q2.processAllAvailable()
    q2.stop()
    assert(rm.read(rel).orderBy("id").as[(Long, String)].collect().map(_._1).toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L))
    val st2 = rm.currentState(rel).get
    assert(st2.txn(wm.get._1) > wm.get._2, "watermark must advance across restarts")

    // a replayed epoch (watermark already ≥ epoch) is discarded, not duplicated:
    // simulate the crash-replay by committing the same epoch id again
    val sw = new org.apache.spark.sql.graft.source.GraftStreamingWrite(
      dir, st2, rm.read(rel).schema,
      org.apache.spark.sql.graft.source.GraftWriteMode.Append,
      wm.get._1.stripPrefix("graft-v2-stream:"))
    sw.commit(st2.txn(wm.get._1), Array.empty)
    assert(rm.read(rel).count() == 5, "replayed epoch must be a no-op")
    assert(rm.currentState(rel).get.version == st2.version)
  }

  test("one task spanning >MaxOpen partition dirs still lands every row") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "main", "v2w_lru")
    // table partitioned by p with 40 values (> the writer pool's 32 cap),
    // appended as ONE task. Spark honors the write's requested ordering,
    // so rows usually arrive sorted (pool stays small and the LRU cap is
    // a safety net for plans that drop it) — either way, routing across
    // more dirs than the cap must never drop or misplace a row.
    rm.writeTable(Seq((0L, "seed", "p00")).toDF("id", "v", "p"),
      rel, partitionBy = Seq("p"), statsCols = Seq("id"))
    val rows = (1 to 400).map(i => (i.toLong, s"v$i", f"p${i % 40}%02d"))
    rows.toDF("id", "v", "p").coalesce(1)
      .write.format("graft").mode("append").save(rm.path(rel).toString)

    val out = rm.read(rel)
    assert(out.count() == 401)
    assert(out.select("p").distinct().count() == 40)
    // every row is in the dir its partition value names
    val st = rm.currentState(rel).get
    assert(st.files.forall(_.startsWith("p=")))
    assert(out.filter($"p" === "p07").count() == 10)
    // eviction produced multiple files for re-visited dirs, but stats
    // stayed per-file exact
    assert(st.files.forall(f => st.stats.get(f).exists(_.contains("id"))))
  }

  test("TIMESTAMP AS OF resolves the latest commit at or before the instant") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "main", "v2w_ts")
    rm.writeTable(Seq((1L, "a")).toDF("id", "v"), rel)       // v1
    Thread.sleep(20)
    rm.appendTable(Seq((2L, "b")).toDF("id", "v"), rel)      // v2
    val t = s"${rm.catalogName}.main.v2w_ts"
    val log = new graft.relations.CommitLog(new graft.relations.LocalFileStore,
      graft.relations.WarehouseIO.join(rm.path(rel), "_graft_log"))
    val at1 = log.committedAt(1).get

    assert(spark.sql(s"SELECT count(*) FROM $t TIMESTAMP AS OF '$at1'")
      .as[Long].head() == 1L, "v1's own commit instant resolves v1")
    assert(spark.sql(s"SELECT count(*) FROM $t TIMESTAMP AS OF '${log.committedAt(2).get}'")
      .as[Long].head() == 2L)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $t TIMESTAMP AS OF '1990-01-01 00:00:00'").collect()
    }
    assert(e.getMessage.contains("no commit at or before"), e.getMessage)
  }

  test("concurrent V2 inserts and engine appends all land (commit CAS)") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val rm = newRm()
    val rel = Relation("graft", "main", "v2w_race")
    rm.writeTable(Seq((-1L, "seed")).toDF("id", "v"), rel, statsCols = Seq("id"))
    val t = s"${rm.catalogName}.main.v2w_race"
    val dir = rm.path(rel).toString

    // 4 writers × 2 protocols racing the same log
    val writers = (0 until 4).map { w =>
      Future {
        if (w % 2 == 0)
          spark.sql(s"INSERT INTO $t VALUES (${w * 100}, 'sql$w'), (${w * 100 + 1}, 'sql$w')")
        else
          rm.appendTable(Seq((w * 100L, s"eng$w"), (w * 100L + 1, s"eng$w")).toDF("id", "v"), rel)
      }
    }
    Await.result(Future.sequence(writers), 120.seconds)

    assert(rm.read(rel).count() == 1 + 8, "every concurrent append must land")
    assert(rm.currentVersion(rel).get == 5, "four commits on top of the seed")
    // stats intact on every file regardless of writer
    val st = rm.currentState(rel).get
    assert(st.files.forall(f => st.stats.get(f).exists(_.contains("id"))))
  }

  test("engine merge composes with external V2 appends on the same log") {
    import spark.implicits._
    val rm = newRm()
    val rel = Relation("graft", "main", "v2w_interop")
    rm.writeTable((0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(5, $"id"), rel, statsCols = Seq("id"))

    Seq((2000L, "ext")).toDF("id", "v")
      .write.format("graft").mode("append").save(rm.path(rel).toString)

    // merge planning prunes by stats ACROSS engine- and V2-written files
    val before = rm.currentState(rel).get
    graft.materializations.Materializations.mergeInto(
      rm, rel, Seq((2000L, "merged")).toDF("id", "v"), Seq("id"), updateColumns = Nil)
    val after = rm.currentState(rel).get
    assert((before.files.toSet -- after.files.toSet).size <= 1,
      "merge after external append must stay file-pruned")
    assert(rm.read(rel).filter($"id" === 2000L).as[(Long, String)].head()._2 == "merged")
    assert(rm.read(rel).count() == 1001)
  }
}
