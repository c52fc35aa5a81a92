package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface: the continuous counterpart of the
  * microbatch materialization (SURVEY §2.1 — the reference's microbatch
  * runner maps 1:1 to a foreachBatch driver loop; true streams go through
  * readStream with watermarked windows and stateful sessionization).
  *
  * Batch/stream parity: `windowedCounts` produces identical results on a
  * static DataFrame and a stream of the same rows — the streaming demo is
  * oracle-checked through its batch equivalent (q_stream_windowed).
  */
object StreamingOps {

  /** Tumbling event-time window aggregate; works on both static and
    * streaming frames (same plan, different sink). At scale the watermark
    * bounds state: late rows beyond it are dropped instead of growing the
    * store. */
  def windowedCounts(events: DataFrame, windowLen: String,
                     watermark: Option[String] = None): DataFrame = {
    val src = watermark.map(w => events.withWatermark("ts", w)).getOrElse(events)
    src.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Streaming curation ingest: the batch curation operators applied to a
    * continuous document feed — quality gate, PII scrub, then exact dedup
    * whose state is BOUNDED by the watermark (dropDuplicatesWithinWatermark
    * evicts a content-hash key once the watermark passes it, so state size
    * tracks the dedup horizon, not corpus history — the property that
    * keeps a months-long ingest from accumulating 100 TB of dedup state).
    * Emits the curated row plus its content hash; downstream sinks pair it
    * with [[appendToTable]] for exactly-once delivery. */
  def curateDocStream(docs: DataFrame, tsCol: String, watermark: String,
                      minQuality: Double): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .filter(graft.ops.TextAnalysis.qualityScore(col("text")) >= minQuality)
      .withColumn("text", graft.ops.PiiRedact.redact(col("text")))
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicatesWithinWatermark("content_hash")

  /** Run a streaming query over a bounded parquet directory and block
    * until it drains (local smoke path: memory sink + processAllAvailable). */
  def runBounded(spark: SparkSession, dir: String, schema: StructType,
                 transform: DataFrame => DataFrame, queryName: String): DataFrame = {
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q: StreamingQuery = transform(stream).writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Exactly-once streaming sink into a commit-log table: every microbatch
    * appends through one atomic log commit that ALSO records
    * (writerId → batchId) in the manifest's txn map. After a crash between
    * "data committed" and "checkpoint advanced", Structured Streaming
    * replays the last batch — the watermark comparison turns the replay
    * into a no-op, so rows land exactly once (the Delta-paper txn pattern,
    * on graft's own log). State lives in the table manifest + the stream
    * checkpoint; nothing driver-resident, so the sink survives restarts
    * and driver failover.
    *
    * `writerId` must be stable per logical stream (reuse across restarts,
    * distinct across different streams into the same table). */
  def appendToTable(stream: DataFrame, rm: graft.relations.RelationManager,
                    rel: graft.core.Relation, writerId: String,
                    checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // fast path: known replays skip the write entirely; the
        // AUTHORITATIVE gate is the log's txn check inside the commit CAS
        // (StaleTxnException), which also closes the zombie-driver race
        // the pre-check alone cannot
        if (rm.lastTxn(rel, writerId).forall(_ < batchId))
          try rm.appendTable(batch, rel, txn = Map(writerId -> batchId))
          catch { case _: graft.relations.StaleTxnException => () }
        ()
      }
      .start()

  /** Tail an APPEND-ONLY commit-log table as a stream: Spark's native file
    * source discovers each commit's new files (staged files live in
    * `_`-prefixed dirs the source ignores, so only committed bytes are
    * ever picked up), with the schema pinned from the table manifest.
    * Composed with [[appendToTable]] this gives continuous end-to-end
    * table→transform→table pipelines with exactly-once delivery — the
    * streaming twin of [[incrementalPipe]].
    *
    * Append-only contract (documented, not detected): a MERGE/compaction
    * rewrite adds files whose rows were already delivered — mutating
    * sources need the batch pipe, which diffs manifests instead of
    * listing. `maxFilesPerTrigger` caps per-batch scan size on backfills. */
  def readTableStream(rm: graft.relations.RelationManager,
                      rel: graft.core.Relation,
                      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    rm.currentState(rel).getOrElse(throw new IllegalArgumentException(
      s"readTableStream: no such table ${rel.render}"))
    // MANIFEST-exact tailing via the V2 connector (offsets are commit
    // versions): published-but-uncommitted orphans from a writer that
    // crashed between publish and commit are invisible by construction —
    // a raw directory-listing file stream would deliver their rows as
    // phantom records. maxFilesPerTrigger rides the connector's admission
    // control: a batch ends at the last commit whose cumulative added
    // files fit the cap (at least one commit per batch), so backfill
    // batches stay bounded exactly as they did under the file source.
    val reader = rm.spark.readStream.format("graft")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.load(rm.path(rel).toString)
  }

  /** Exactly-once incremental table-to-table pipe: read the source rows
    * committed since this pipe's last run (file-granular change feed),
    * transform, append to the destination — recording the consumed source
    * version in the SAME destination commit. Crash anywhere and the rerun
    * either replays into a no-op (watermark already at srcV) or picks up
    * where it left off; rows land exactly once without any state outside
    * the two tables' own logs. Returns the source version consumed, or
    * None when the destination is already caught up.
    *
    * This is the batch/driver-loop form of commit-log tailing (the
    * continuous form is [[appendToTable]] fed by any readStream source);
    * scheduled from an orchestrator it gives CDC-shaped incremental
    * pipelines over graft tables with no full rescans — O(new files) per
    * run. Source tables must be commit-logged (pre-log directories have
    * no version to diff). */
  def incrementalPipe(rm: graft.relations.RelationManager,
                      src: graft.core.Relation, dst: graft.core.Relation,
                      pipeId: String,
                      transform: DataFrame => DataFrame = identity): Option[Int] = {
    val srcV = rm.currentVersion(src).getOrElse(
      throw new IllegalArgumentException(
        s"incrementalPipe: source ${src.render} has no commit log"))
    val from = rm.lastTxn(dst, pipeId).map(_.toInt).getOrElse(0)
    if (srcV <= from) None
    else {
      val changes = rm.readChanges(src, from, srcV)
      rm.appendTable(transform(changes), dst, txn = Map(pipeId -> srcV.toLong))
      Some(srcV)
    }
  }

  /** Exactly-once CDC replication between keyed commit-log tables: diff
    * the source's row-level changes since this pipe's watermark (updates,
    * deletes, inserts — file-pruned rewrites cancel to exact row deltas)
    * and apply them to the destination in one commit carrying the consumed
    * source version. The mutating-source counterpart of
    * [[incrementalPipe]]: a MERGE- or snapshot-maintained source
    * replicates correctly, at O(changed files) per run. Intervals with
    * file churn but no row changes (compaction) record the watermark with
    * a zero-row commit so the next diff starts from the right version. */
  def cdcPipe(rm: graft.relations.RelationManager,
              src: graft.core.Relation, dst: graft.core.Relation,
              uniqueKey: Seq[String], pipeId: String): Option[Int] = {
    val srcV = rm.currentVersion(src).getOrElse(
      throw new IllegalArgumentException(
        s"cdcPipe: source ${src.render} has no commit log"))
    val from = rm.lastTxn(dst, pipeId).map(_.toInt).getOrElse(0)
    if (srcV <= from) None
    else {
      val changes = rm.readRowChanges(src, from, srcV)
      val applied = graft.materializations.Materializations.applyChanges(
        rm, dst, changes, uniqueKey, Map(pipeId -> srcV.toLong))
      if (!applied && rm.exists(dst)) rm.recordTxn(dst, Map(pipeId -> srcV.toLong))
      if (applied || rm.exists(dst)) Some(srcV) else None
    }
  }

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(nEvents: Long, total: Double, lastTs: Long)
  final case class UserSession(user_id: Long, n_events: Long, total_value: Double,
                               session_end: java.sql.Timestamp)

  /** Stateful sessionization via mapGroupsWithState: emit a session per
    * user when `gapMs` of inactivity passes (processing-time timeout in
    * the streaming case; on the bounded demo we flush at drain). The state
    * store holds one small record per active user — bounded, spillable,
    * and partitioned by user_id, which is the 100 TB-safe shape. */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSession](GroupStateTimeout.NoTimeout) {
        (userId, rows, state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          val init = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
          val agg = sorted.foldLeft(init) { (st, e) =>
            if (st.lastTs != Long.MinValue && e.ts.getTime - st.lastTs > gapMs)
              SessionState(1L, e.value, e.ts.getTime) // gap → new session (previous one closes)
            else SessionState(st.nEvents + 1, st.total + e.value, e.ts.getTime)
          }
          state.update(agg)
          UserSession(userId, agg.nEvents, agg.total, new java.sql.Timestamp(agg.lastTs))
      }
  }
}
