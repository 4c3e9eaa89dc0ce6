package graft.streaming

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q184 (timer-driven transformWithState sessionization) against
  * the engine's own batch `session_window` — an implementation the gate
  * shares no code with. Every session must be emitted by the timer
  * path; a watermark/timer regression surfaces as missing or split
  * sessions.
  */
class TimerSessionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q184 timer-evicted sessions equal batch session_window") {
    val expected = Tables.events(spark, sf)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = graft.SparkEntry.queries("q184_timer_sessions")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got.nonEmpty)
    assert(got === expected)
  }
}
