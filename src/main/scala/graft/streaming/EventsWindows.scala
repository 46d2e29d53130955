package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-time window operators over the `events` stream table. The
  * reference has no streaming surface at all (SURVEY.md §2.3) — this is
  * the Structured-Streaming-shaped extension, expressed so the SAME
  * aggregation runs identically in batch (these oracle-checked queries)
  * and under `readStream` (StreamingSpec drives the genuine streaming
  * path with a watermark + memory sink and asserts equality with the
  * batch result).
  *
  * Scale posture: tumbling/sliding aggs shuffle once on (window, type);
  * session windows shuffle on user_id — Spark's native session_window
  * merges per-key in the aggregation, no per-event state explosion.
  */
object EventsWindows {

  /** Tumbling 1-hour counts/sums per event_type.
    * Output: (win_start, event_type, n, total).
    */
  def tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("total"))
      .orderBy(col("win_start"), col("event_type"))

  /** Sliding 1-hour windows hopping every 30 minutes. */
  def sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("total"))
      .orderBy(col("win_start"), col("event_type"))

  /** Gap-based session windows per user (5-minute inactivity gap).
    * Spark semantics: a session's end is last-event + gap; an event at
    * exactly prev_ts + gap starts a NEW session.
    * Output: (user_id, session_start, session_end, n_events).
    */
  def sessions(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
}
