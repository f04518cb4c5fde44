package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match each point row to every
  * interval row whose [start, end] contains the point's timestamp, per
  * equi-key — "which promo window / session span / outage covers this
  * event". Complements [[AsOfJoin]] (latest-single-match) as the
  * many-match temporal join of the extension surface.
  *
  * Spark-first shape: Spark plans `p.ts BETWEEN i.s AND i.e` with an
  * equi-key as a SortMergeJoin whose range predicate is a POST-JOIN
  * filter — every (point, interval) pair sharing the key is generated
  * first, O(|P_k|·|I_k|) per key. The bucketed form here makes the
  * range part of the JOIN KEY: points map to one fixed-width time
  * bucket, intervals replicate to each bucket they overlap, and the
  * equi-join on (keys…, bucket) meets exactly the pairs whose buckets
  * collide, then the exact containment predicate filters. Each
  * surviving pair meets exactly once (a point owns exactly one
  * bucket), so no dedup pass is needed.
  *
  * Cost model: interval replication factor is len/width + 1 — pick
  * `bucketSeconds` ≈ the typical interval length so it stays ≤ 2, and
  * per-task work is bounded by bucket population, not key population.
  * A pathologically long interval replicates to many buckets but never
  * explodes a single task (its copies spread across the bucket hash
  * space). At 100 TB this is the difference between a shuffle keyed on
  * (user) — one task per hot user doing a quadratic filter — and a
  * shuffle keyed on (user, hour) with linear-in-output work.
  */
object RangeJoin {

  /** Inner join of `points` to the `intervals` containing them
    * (inclusive on both ends).
    *
    * @param on            equi-join key columns (present on both sides)
    * @param pointTs       timestamp column on `points`
    * @param startTs       interval start timestamp column on `intervals`
    * @param endTs         interval end timestamp column on `intervals`
    * @param bucketSeconds bucket width; choose ≈ typical interval length
    *
    * Preconditions: interval columns other than `on` must not collide
    * with point columns (rename first); start <= end on every row.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      on: Seq[String], pointTs: String,
                      startTs: String, endTs: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val collide = points.columns.intersect(
      intervals.columns.filterNot(on.contains))
    require(collide.isEmpty,
      s"interval payload columns collide with point columns: " +
        s"rename first (${collide.mkString(", ")})")

    def bucketOf(ts: Column): Column =
      floor(unix_timestamp(ts) / bucketSeconds)

    val pb = points.withColumn("_rj_bucket", bucketOf(col(pointTs)))
    val ib = intervals.withColumn("_rj_bucket",
      explode(sequence(bucketOf(col(startTs)), bucketOf(col(endTs)))))
    pb.join(ib, on :+ "_rj_bucket")
      .where(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("_rj_bucket")
  }
}
