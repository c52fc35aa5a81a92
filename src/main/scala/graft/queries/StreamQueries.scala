package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.StreamingOps

/** Streaming operators checked through batch/stream parity: the SAME
  * windowedCounts plan runs here on the static frame (oracle-checkable)
  * and on a real readStream in StreamingSpec (asserted equal).
  */
object StreamQueries {

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_windowed" -> ((s, d) => {
      StreamingOps.windowedCounts(Tables.events(s, d), "1 hour")
        .orderBy("window_start", "event_type")
    }),

    "q_stream_sessionize" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("value"))
        .as[StreamingOps.SessionEvent]
      StreamingOps.sessionize(ev, gapMs = 6L * 3600 * 1000)
        .toDF()
        .select(col("user_id"), col("n_events"), round(col("total_value"), 4).as("total_value"))
        .orderBy("user_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_stream_windowed" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    // sessionize with a 6h gap: events span ~continuous activity, so each
    // user's final state = events since their last >6h silence. The oracle
    // replays the same fold in SQL: a session break flag + running session
    // id per user, then the stats of each user's LAST session.
    "q_stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CASE WHEN lag(ts) OVER w IS NOT NULL
        |          AND date_diff('millisecond', CAST(lag(ts) OVER w AS TIMESTAMP), CAST(ts AS TIMESTAMP)) > 6*3600*1000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM e),
        |last_session AS (
        |  SELECT user_id, max(session_id) AS session_id FROM s GROUP BY user_id)
        |SELECT s.user_id, COUNT(*) AS n_events,
        |  round(SUM(value), 4) AS total_value
        |FROM s JOIN last_session USING (user_id, session_id)
        |GROUP BY s.user_id ORDER BY s.user_id""".stripMargin
  )
}
