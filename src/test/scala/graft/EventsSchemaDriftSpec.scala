package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r7 "what's wrong" #1 — the driver's events.parquet fixture
  * changed physical ts encoding between rounds (timestamp[ns] read as
  * BIGINT nanos under nanosAsLong → timestamp[us] read as
  * TIMESTAMP_NTZ), and a loader hard-coding one encoding lost 9 gate
  * rows. Tables.events must normalize EVERY encoding the fixture has
  * ever used to the same session-UTC TIMESTAMP values. */
class EventsSchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // one instant, three physical spellings
  private val micros = 1510441488246017L // 2017-11-11T22:24:48.246017Z

  private def freshDir(): String =
    Files.createTempDirectory("graft_events_drift").toString

  private def assertNormalized(dir: String): Unit = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must normalize to TIMESTAMP, got ${df.schema("ts").dataType}")
    val got = df.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == micros, s"wall-clock drifted: $got != $micros")
  }

  test("BIGINT nanos (the r1-r6 nanosAsLong read) converts via integer DIV") {
    val dir = freshDir()
    spark.range(1).select(
      lit(micros * 1000L).as("ts"), lit("view").as("event_type"),
      lit(1L).as("user_id"), lit(2.0).as("value"))
      .write.parquet(s"$dir/events.parquet")
    assertNormalized(dir)
  }

  test("TIMESTAMP_NTZ micros (the r7+ fixture) casts losslessly under the UTC session") {
    val dir = freshDir()
    spark.range(1).select(
      timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts"),
      lit("view").as("event_type"), lit(1L).as("user_id"), lit(2.0).as("value"))
      .write.parquet(s"$dir/events.parquet")
    assertNormalized(dir)
  }

  test("plain TIMESTAMP passes through untouched") {
    val dir = freshDir()
    spark.range(1).select(
      timestamp_micros(lit(micros)).as("ts"),
      lit("view").as("event_type"), lit(1L).as("user_id"), lit(2.0).as("value"))
      .write.parquet(s"$dir/events.parquet")
    assertNormalized(dir)
  }

  test("an unsupported encoding fails loudly, not with a downstream analysis error") {
    val dir = freshDir()
    spark.range(1).select(
      lit("2017-11-11").as("ts"), // string: no sanctioned conversion
      lit("view").as("event_type"), lit(1L).as("user_id"), lit(2.0).as("value"))
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported type"))
  }
}
