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

  /** Resample to a dense daily grid with forward-fill — the time-series
    * gap-fill every analytics stack needs (a day with no events still
    * gets a row, carrying the last observed value): per user, the grid
    * spans [min day, max day] via `sequence` + explode, observed days
    * left-join on, and `last(_, ignoreNulls)` carries counts forward.
    * Gaps are flagged so downstream can distinguish observed zeros from
    * filled ones. Exact long counts — no FP in the fill.
    *
    * Scale shape: the per-user aggregate is map-side partial; the grid
    * explode is bounded by each user's date SPAN (grid rows, not event
    * rows); the fill window partitions by user — one exchange on
    * user_id shared by grid, join, and window. At 100 TB the span
    * bound matters: a year-long user is 365 grid rows regardless of
    * event count.
    *
    * Dirty-timestamp guard: the span bound is only a bound if the data
    * is sane — ONE corrupt epoch-zero timestamp would give that user a
    * ~20k-row grid (and a year-9999 one a 3M-row grid). Any user whose
    * span exceeds `maxSpanDays` fails LOUDLY (raise_error inside the
    * grid projection) rather than silently exploding the output;
    * callers with legitimately longer histories raise the knob, callers
    * with dirty data clamp upstream. Default 3653 days = ten years.
    */
  def resampleDailyFfill(events: DataFrame, maxSpanDays: Int = 3653): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), to_date(col("ts")).as("dt"))
      .agg(count(lit(1)).as("n"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("dt")).as("d0"), max(col("dt")).as("d1"))
      .select(col("user_id"),
        explode(when(datediff(col("d1"), col("d0")) <= maxSpanDays,
          expr("sequence(d0, d1, interval 1 day)"))
          .otherwise(raise_error(concat(
            lit("resampleDailyFfill: user "), col("user_id").cast("string"),
            lit(" spans "), datediff(col("d1"), col("d0")).cast("string"),
            lit(s" days > maxSpanDays=$maxSpanDays — dirty timestamp? " +
              "Clamp upstream or raise the knob."))))).as("dt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("dt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(daily, Seq("user_id", "dt"), "left")
      .select(col("user_id"), col("dt"),
        last(col("n"), ignoreNulls = true).over(w).as("n_filled"),
        col("n").isNull.as("is_gap"))
  }
}
