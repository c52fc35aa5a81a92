package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Batch/stream parity: the same windowedCounts plan over the same rows
  * must agree between the static frame and a real readStream execution. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming windowed counts equal batch windowed counts") {
    val batchEvents = Tables.events(spark, sf)
    // stage a micro-timestamp copy (the raw file is TIMESTAMP(NANOS) which
    // the streaming reader also rejects)
    val dir = Files.createTempDirectory("graft_stream").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val staged = spark.read.parquet(dir)

    val batch = StreamingOps.windowedCounts(staged, "1 hour")
      .orderBy("window_start", "event_type").collect()

    val streamed = StreamingOps.runBounded(
      spark, dir, staged.schema,
      df => StreamingOps.windowedCounts(df, "1 hour", watermark = Some("2 hours")),
      queryName = "stream_parity_test")
      .orderBy("window_start", "event_type").collect()

    assert(batch.length == streamed.length)
    assert(batch.map(_.toString).toSeq == streamed.map(_.toString).toSeq)
  }

  test("sessionize emits one final session per user with positive counts") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value"))
      .as[StreamingOps.SessionEvent]
    val sessions = StreamingOps.sessionize(ev, gapMs = 6L * 3600 * 1000).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(sessions.length == users)
    assert(sessions.forall(_.n_events > 0))
  }

  test("exactly-once streaming sink: batch txn watermark makes replays no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.core.Relation
    import graft.relations.RelationManager
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val rm = new RelationManager(spark, Files.createTempDirectory("graft_sink").toString)
    val rel = Relation("graft", "main", "stream_target")
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString

    val src = MemoryStream[(Long, String)]
    val q = StreamingOps.appendToTable(
      src.toDF().toDF("id", "payload"), rm, rel, "writer_a", ckpt)
    src.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    src.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()

    assert(rm.read(rel).count() == 3)
    val lastBatch = rm.lastTxn(rel, "writer_a").get
    val vBefore = rm.currentState(rel).get.version

    // crash-replay simulation: re-deliver the last batch (same writer,
    // same batch id) — the watermark turns it into a no-op
    val replay = Seq((3L, "c")).toDF("id", "payload")
    if (rm.lastTxn(rel, "writer_a").forall(_ < lastBatch))
      rm.appendTable(replay, rel, txn = Map("writer_a" -> lastBatch))
    assert(rm.read(rel).count() == 3, "replayed batch must not duplicate rows")
    assert(rm.currentState(rel).get.version == vBefore)

    // a DIFFERENT writer's batch 0 is not confused with writer_a's
    assert(rm.lastTxn(rel, "writer_b").isEmpty)

    // restart the stream from the same checkpoint: new data still lands
    val q2 = StreamingOps.appendToTable(
      src.toDF().toDF("id", "payload"), rm, rel, "writer_a", ckpt)
    src.addData((4L, "d"))
    q2.processAllAvailable()
    q2.stop()
    assert(rm.read(rel).count() == 4)
    assert(rm.lastTxn(rel, "writer_a").get > lastBatch)
  }

  test("incrementalPipe: exactly-once table-to-table pipe over the change feed") {
    import graft.core.Relation
    import graft.relations.RelationManager
    import spark.implicits._

    val rm = new RelationManager(spark, Files.createTempDirectory("graft_pipe").toString)
    val src = Relation("graft", "main", "pipe_src")
    val dst = Relation("graft", "main", "pipe_dst")

    rm.writeTable(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), src)
    rm.appendTable(Seq((3L, 30.0)).toDF("id", "v"), src)

    // first pipe run: consumes versions 1..2, doubles v
    val c1 = StreamingOps.incrementalPipe(rm, src, dst, "pipe:src",
      df => df.withColumn("v", col("v") * 2))
    assert(c1.contains(2))
    assert(rm.read(dst).orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 20.0), (2L, 40.0), (3L, 60.0)))

    // caught up → no-op (and no empty commit)
    val vBefore = rm.currentState(dst).get.version
    assert(StreamingOps.incrementalPipe(rm, src, dst, "pipe:src").isEmpty)
    assert(rm.currentState(dst).get.version == vBefore)

    // new source commit → only the delta flows
    rm.appendTable(Seq((4L, 40.0)).toDF("id", "v"), src)
    val c2 = StreamingOps.incrementalPipe(rm, src, dst, "pipe:src",
      df => df.withColumn("v", col("v") * 2))
    assert(c2.contains(3))
    assert(rm.read(dst).count() == 4)
    assert(rm.read(dst).filter(col("id") === 4L).collect()(0).getDouble(1) == 80.0)

    // two independent pipes from the same source don't share watermarks
    val dst2 = Relation("graft", "main", "pipe_dst2")
    assert(StreamingOps.incrementalPipe(rm, src, dst2, "pipe2:src").contains(3))
    assert(rm.read(dst2).count() == 4)
  }

  test("end-to-end continuous pipeline: table stream -> transform -> exactly-once sink") {
    import graft.core.Relation
    import graft.relations.RelationManager
    import spark.implicits._

    val rm = new RelationManager(spark, Files.createTempDirectory("graft_e2e").toString)
    val src = Relation("graft", "main", "e2e_src")
    val dst = Relation("graft", "main", "e2e_dst")
    val ckpt = Files.createTempDirectory("graft_e2e_ckpt").toString

    rm.writeTable(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), src)
    val q = StreamingOps.appendToTable(
      StreamingOps.readTableStream(rm, src).withColumn("v", col("v") * 10),
      rm, dst, "e2e_writer", ckpt)
    q.processAllAvailable()
    assert(rm.read(dst).count() == 2)

    // a new commit on the source flows through while the query runs
    rm.appendTable(Seq((3L, 3.0)).toDF("id", "v"), src)
    q.processAllAvailable()
    q.stop()
    val out = rm.read(dst).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // staged/internal files were never picked up: row count exact, no dups
    assert(rm.currentState(dst).get.txn.contains("e2e_writer"))
  }

  test("maxFilesPerTrigger bounds each microbatch via admission control") {
    import graft.core.Relation
    import graft.relations.RelationManager
    import org.apache.spark.sql.graft.source.{GraftMicroBatchStream, GraftVersionOffset}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import spark.implicits._

    val rm = new RelationManager(spark, Files.createTempDirectory("graft_mft").toString)
    val rel = Relation("graft", "main", "mft_src")
    // three commits, two files each
    (0 until 3).foreach { c =>
      val df = (0 until 20).map(i => (c * 100L + i, s"c$c")).toDF("id", "v")
        .repartition(2)
      if (c == 0) rm.writeTable(df, rel) else rm.appendTable(df, rel)
    }
    val dir = rm.path(rel).toString
    val stream = new GraftMicroBatchStream(dir, () => null, // factory unused here
      new org.apache.spark.sql.types.StructType(), None, Some(2))
    def admit(from: Int, cap: Int): Int =
      stream.latestOffset(GraftVersionOffset(from), ReadLimit.maxFiles(cap))
        .asInstanceOf[GraftVersionOffset].version
    assert(admit(0, 2) == 1, "cap 2 admits exactly the first 2-file commit")
    assert(admit(0, 3) == 1, "cap 3 cannot fit commit 2's files — stop at v1")
    assert(admit(0, 4) == 2)
    assert(admit(0, 100) == 3)
    assert(admit(1, 2) == 2)
    assert(admit(0, 1) == 1, "an oversized commit still admits (progress guarantee)")

    // end-to-end: the capped stream delivers every row exactly once, in
    // more batches
    val q = StreamingOps.readTableStream(rm, rel, maxFilesPerTrigger = Some(2))
      .writeStream.format("memory").queryName("mft_sink")
      .option("checkpointLocation", Files.createTempDirectory("graft_mft_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("mft_sink").count() == 60)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 3,
        s"2-file cap over 3 2-file commits = 3 batches, got ${batches.length}")
      assert(batches.forall(_.numInputRows == 20))
    } finally q.stop()
  }

  test("cdcPipe replicates a MERGE-maintained keyed table: updates, deletes, compaction") {
    import graft.core.Relation
    import graft.relations.RelationManager
    import graft.materializations.Materializations
    import spark.implicits._

    val rm = new RelationManager(spark, Files.createTempDirectory("graft_cdc").toString)
    val src = Relation("graft", "main", "cdc_src")
    val dst = Relation("graft", "main", "cdc_dst")
    def srcRows() = rm.read(src).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    def dstRows() = rm.read(dst).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    rm.writeTable((0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, col("id")), src, statsCols = Seq("id"))

    // bootstrap: from-version-0 feed creates the destination
    assert(StreamingOps.cdcPipe(rm, src, dst, Seq("id"), "cdc:src").isDefined)
    assert(dstRows() == srcRows())

    // caught up → None
    assert(StreamingOps.cdcPipe(rm, src, dst, Seq("id"), "cdc:src").isEmpty)

    // update 2 keys + insert 1 through MERGE, then replicate
    Materializations.mergeInto(rm, src,
      Seq((5L, "u5"), (50L, "u50"), (200L, "new")).toDF("id", "v"),
      Seq("id"), updateColumns = Nil)
    assert(StreamingOps.cdcPipe(rm, src, dst, Seq("id"), "cdc:src").isDefined)
    assert(dstRows() == srcRows())

    // a pure delete on the source replicates as a delete
    val st = rm.currentState(src).get
    rm.commitReplace(rm.read(src).filter(col("id") =!= 7L), src, st.files)
    assert(StreamingOps.cdcPipe(rm, src, dst, Seq("id"), "cdc:src").isDefined)
    assert(dstRows() == srcRows())
    assert(!dstRows().exists(_._1 == 7L))

    // compaction churns files without row changes → watermark advances,
    // destination untouched
    rm.optimize(src)
    val dstVer = rm.currentState(dst).get.version
    StreamingOps.cdcPipe(rm, src, dst, Seq("id"), "cdc:src")
    assert(dstRows() == srcRows())
    assert(rm.lastTxn(dst, "cdc:src").get.toInt == rm.currentVersion(src).get)
    assert(rm.read(dst).count() == 100)
    assert(rm.currentState(dst).get.version <= dstVer + 1) // zero-row commit at most
  }

  test("cdcPipe randomized trials: stepwise replication tracks arbitrary merge/delete histories") {
    import graft.core.Relation
    import graft.relations.RelationManager
    import graft.materializations.Materializations
    import spark.implicits._

    val rnd = new scala.util.Random(7)
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_cdcp").toString)
    for (trial <- 1 to 3) {
      val src = Relation("graft", "main", s"cdcp_src_$trial")
      val dst = Relation("graft", "main", s"cdcp_dst_$trial")
      def rows(rel: Relation) = rm.read(rel).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq

      val n = 50 + rnd.nextInt(50)
      rm.writeTable((0L until n).map(i => (i, s"t$trial-v$i")).toDF("id", "v")
        .repartitionByRange(3, col("id")), src, statsCols = Seq("id"))

      for (step <- 1 to 4) {
        rnd.nextInt(3) match {
          case 0 => // merge: update some keys + insert new ones
            val ups = Seq.fill(1 + rnd.nextInt(5))(rnd.nextInt(n * 2).toLong).distinct
              .map(k => (k, s"t$trial-s$step-$k")).toDF("id", "v")
            Materializations.mergeInto(rm, src, ups, Seq("id"), updateColumns = Nil)
          case 1 => // delete a random key (full-list replace keeps it honest)
            val st = rm.currentState(src).get
            rm.commitReplace(rm.read(src).filter(col("id") =!= rnd.nextInt(n).toLong),
              src, st.files)
          case 2 => // plain append of fresh keys
            val base = 10000L * step + 100L * trial
            rm.appendTable(Seq((base, s"a$step"), (base + 1, s"b$step")).toDF("id", "v"), src)
        }
        StreamingOps.cdcPipe(rm, src, dst, Seq("id"), "cdc")
        assert(rows(dst) == rows(src), s"trial $trial step $step diverged")
      }
    }
  }
}
