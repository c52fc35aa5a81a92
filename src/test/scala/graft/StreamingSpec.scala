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
}
