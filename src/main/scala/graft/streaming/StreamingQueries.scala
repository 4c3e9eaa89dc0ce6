package graft.streaming

import graft.{Q, QueryPack}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface (north-star extension — the reference is
  * explicitly batch-only, mapreduce.py:24). Two shapes:
  *
  *   - q70: the flagship month-count (RefWorkload q07) run as a REAL
  *     streaming query — `readStream` over the events parquet, complete-
  *     mode aggregation into a memory sink, drained synchronously with
  *     `processAllAvailable`. Same oracle as the batch query: streaming
  *     and batch must agree exactly.
  *   - q71: gap-based session windows via `session_window` — the engine
  *     primitive behind streaming sessionization — checked against a pure
  *     SQL gap-merge oracle (new session iff gap ≥ 30 min, matching
  *     Spark's half-open window-merge semantics).
  *
  * Watermark/append-mode late-data semantics (not expressible as a
  * finite-input oracle query) are pinned in StreamingSpec instead.
  */
object StreamingQueries extends QueryPack {

  /** q70: month-count as a streaming aggregation. */
  private def q70(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // The file-stream source wants a directory; select just the events
    // table out of the sf dir with a glob filter.
    val stream = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = stream
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"))
    val name = "graft_q70_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try query.processAllAvailable()
    finally query.stop()
    // materialize and drop the memory-sink view so repeated invocations
    // (bench warm + measured passes) don't accumulate driver-side tables
    val result = s.table(name).orderBy("event_type", "month")
    val rows = result.collect()
    val out = s.createDataFrame(
      java.util.Arrays.asList(rows: _*), result.schema)
    s.catalog.dropTempView(name)
    out
  }

  /** q78: streaming dedup — `dropDuplicates` keeps first-seen keys in
    * state (the streaming counterpart of Dedup q40), then the deduped
    * stream is aggregated batch-side. Exact vs the batch DISTINCT oracle:
    * with a finite replay, first-seen-per-key is set-equal to DISTINCT
    * regardless of arrival order. At scale the state store bounds memory;
    * `dropDuplicatesWithinWatermark` is the knob when keys outlive the
    * retention window (pinned in StreamingDedupSpec). */
  private def q78(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val stream = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .select(col("event_type"), col("user_id"))
      .dropDuplicates("event_type", "user_id")
    val name = "graft_q78_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try query.processAllAvailable()
    finally query.stop()
    val result = s.table(name)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("event_type")
    val rows = result.collect()
    val out = s.createDataFrame(
      java.util.Arrays.asList(rows: _*), result.schema)
    s.catalog.dropTempView(name)
    out
  }

  /** q71: session_window (30-minute gap) per user. */
  private def q71(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")

  override def queries: Seq[Q] = Seq(
    Q("q70_stream_month_count", q70, Some(
      """SELECT event_type, strftime(ts, '%Y-%m') AS month, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    Q("q71_session_window", q71, Some(
      """WITH t AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CASE WHEN us - lag(us) OVER w >= 1800000000 THEN 1
        |         WHEN lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        |), s AS (
        |  SELECT user_id, us,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        |  FROM t
        |)
        |SELECT user_id, min(us) AS start_us,
        |  max(us) + 1800000000 AS end_us, count(*) AS n_events
        |FROM s GROUP BY user_id, session_no ORDER BY user_id, start_us""".stripMargin)),
    Q("q78_stream_dedup", q78, Some(
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
  )
}
