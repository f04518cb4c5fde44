package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations over the `events` stream table, in
  * their batch form (the streaming form — readStream + watermark — lives
  * in graft.streaming and is exercised by tests; batch `window()` /
  * `session_window()` produce identical window boundaries, which is what
  * the DuckDB oracle verifies).
  */
object EventWindows {

  private def cents = round(col("value") * 100).cast("long")

  /** Tumbling 1-hour windows per event type. */
  def tumbling(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents).as("cents"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("cents"))

  /** Sliding 1-hour windows every 30 minutes (each event in 2 windows). */
  def sliding(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), sum(cents).as("cents"))
      .select(col("window.start").as("wstart"), col("n"), col("cents"))

  /** Session windows with a 30-minute inactivity gap, per user.
    * Session end = last event + gap (Spark semantics). */
  def sessions(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(cents).as("cents"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"), col("cents"))
}
