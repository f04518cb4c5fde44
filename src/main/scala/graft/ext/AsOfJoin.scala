package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, attach the single right row
  * with the greatest right timestamp <= the left timestamp (backward),
  * or the smallest >= (forward), per key — the join a feature-store /
  * point-in-time-correct training pipeline needs ("the latest profile
  * snapshot as of this interaction", no future leakage).
  *
  * Not in the reference (SURVEY §2.4 notes the absence); built as the
  * extension surface's range-join representative.
  *
  * Spark-first shape — composition of built-ins, no custom plan needed:
  * tag-and-union both sides, ONE shuffle on the key, and a per-key
  * running `last(right_payload, ignoreNulls)` window ordered by
  * (ts, tag) — right rows sort before left rows at equal ts, making the
  * match inclusive. Cost is one exchange + one in-partition sort of
  * |L|+|R| rows: no range-condition BroadcastNestedLoop, no candidate
  * explosion, and skew behaves like any per-key window (one key's
  * series = one task's sort run).
  *
  * Preconditions: right rows unique per (key, rightTs) — dedupe first
  * (e.g. `groupBy(key, ts).agg(max(...))`) or ties resolve arbitrarily;
  * right column names must not collide with left's (rename before).
  *
  * `tolerance`: maximum allowed staleness — a match further than this
  * from the left timestamp is nulled out (for TimestampType use an
  * interval expression, e.g. `expr("INTERVAL '1' HOUR")`).
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
               leftTs: String, rightTs: String,
               tolerance: Option[Column] = None): DataFrame =
    asof(left, right, on, leftTs, rightTs, forward = false, tolerance)

  def forward(left: DataFrame, right: DataFrame, on: Seq[String],
              leftTs: String, rightTs: String,
              tolerance: Option[Column] = None): DataFrame =
    asof(left, right, on, leftTs, rightTs, forward = true, tolerance)

  private def asof(left: DataFrame, right: DataFrame, on: Seq[String],
                   leftTs: String, rightTs: String, forward: Boolean,
                   tolerance: Option[Column]): DataFrame = {
    val rightPayload = right.columns.filterNot(on.contains).toSeq
    require(rightPayload.contains(rightTs), s"right side must carry $rightTs")
    require(left.columns.intersect(rightPayload).isEmpty,
      s"right payload columns collide with left: rename first " +
        s"(${left.columns.intersect(rightPayload).mkString(", ")})")

    val rNorm = right.select(
      on.map(col) ++ Seq(
        col(rightTs).as("_asof_ts"), lit(0).as("_asof_tag"),
        struct(rightPayload.map(col): _*).as("_asof_r")): _*)
    val lNorm = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_tag", lit(1))
    // allowMissingColumns: left rows get a typed null _asof_r, right rows
    // typed nulls for the left payload
    val unioned = lNorm.unionByName(rNorm, allowMissingColumns = true)

    val ord =
      if (forward) Seq(col("_asof_ts").desc, col("_asof_tag").asc)
      else Seq(col("_asof_ts").asc, col("_asof_tag").asc)
    val w = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(col("_asof_r"), ignoreNulls = true).over(w)

    val matched = tolerance match {
      case None => carried
      case Some(tol) =>
        val mTs = carried.getField(rightTs)
        val staleness =
          if (forward) mTs - col(leftTs) else col(leftTs) - mTs
        when(staleness <= tol, carried)
    }
    unioned
      .withColumn("_asof_m", matched)
      .where(col("_asof_tag") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightPayload.map(c => col("_asof_m").getField(c).as(c)): _*)
  }
}
