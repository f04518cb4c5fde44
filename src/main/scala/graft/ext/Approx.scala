package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-sketch surface — the wide-domain 100 TB opt-in that
  * SURVEY §2.5 (A7) and the q56 notes promise.
  *
  * Why sketches are the scale path:
  *  - `approx_count_distinct` (HyperLogLog++): a FIXED-size sketch per
  *    group (~(1.04/rsd)² registers) instead of shuffling every distinct
  *    key; sketches merge map-side, so the exchange carries sketch
  *    bytes, not the key domain. Relative error ≈ `rsd` with high
  *    probability.
  *  - `approx_percentile` (GK-style quantile summary): bounded summary
  *    with rank error ≤ n/`accuracy`, mergeable map-side. The exact
  *    `percentile` materializes every group's values; at a wide domain
  *    that collect IS the bottleneck.
  *
  * Verification contract: DuckDB cannot hash-match sketch INTERNALS
  * (different HLL/quantile implementations), so the driver registry
  * keeps EXACT operators (q05 distinct, q56 percentiles, q104 the
  * combined sketch-shaped rollup) and the approx twins are gated by
  * error-bound property specs (ApproxSpec): on the same relation,
  * |approx − exact| must land inside the configured rsd/accuracy bound.
  *
  * Opt-in rule per operator (documented here, 1:1 call-site swaps):
  *  - [[usersPerType]] → [[usersPerTypeApprox]] when the group-key ×
  *    distinct-user domain stops fitting the exact-distinct shuffle
  *    (rule of thumb: >10⁸ distinct keys per executor's agg budget);
  *  - [[centsPercentilesPerType]] → [[centsPercentilesPerTypeApprox]]
  *    when per-group value counts make the exact percentile's full
  *    value materialization the stage bottleneck (>10⁷ rows/group).
  */
object Approx {

  private def cents = round(col("value") * 100).cast("long")

  /** EXACT distinct users + value percentiles per event type — the
    * sketch-shaped rollup in its exact form (registered as q104; the
    * oracle is plain SQL). */
  def sketchRollup(events: DataFrame): DataFrame =
    events.withColumn("cents", cents)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"),
        count(lit(1)).as("n"),
        expr("percentile(cents, 0.5)").as("p50"),
        expr("percentile(cents, 0.99)").as("p99"))

  /** Exact distinct users per event type. */
  def usersPerType(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"))

  /** HLL++ twin of [[usersPerType]]. `rsd` = target relative standard
    * deviation (Spark default 0.05). */
  def usersPerTypeApprox(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("users"))

  /** Exact interpolated value-cents percentiles per event type. */
  def centsPercentilesPerType(events: DataFrame): DataFrame =
    events.withColumn("cents", cents)
      .groupBy(col("event_type"))
      .agg(expr("percentile(cents, 0.5)").as("p50"),
        expr("percentile(cents, 0.99)").as("p99"))

  /** Quantile-summary twin of [[centsPercentilesPerType]]: rank error
    * ≤ group-rows/`accuracy`. Emits exact-type longs (the sketch returns
    * an OBSERVED value, not an interpolation). */
  def centsPercentilesPerTypeApprox(events: DataFrame,
                                    accuracy: Int = 10000): DataFrame =
    events.withColumn("cents", cents)
      .groupBy(col("event_type"))
      .agg(expr(s"approx_percentile(cents, 0.5, $accuracy)").as("p50"),
        expr(s"approx_percentile(cents, 0.99, $accuracy)").as("p99"))
}
