package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve utilities: interleave the bits of two
  * dimension keys so that rows close in BOTH dimensions are close in
  * the one-dimensional sort order. Writing a table sorted by z-value
  * clusters multi-dimensional locality into parquet row groups, so a
  * box predicate on (x, y) prunes via min/max statistics on a single
  * column — the layout trick Delta's OPTIMIZE ZORDER and Iceberg's
  * sort orders use, here as a plain column expression.
  *
  * Query pattern (the superset property, verified by q79's oracle and
  * ZOrderSpec): for a box [x0,x1]×[y0,y1], every row in the box has
  * z ∈ [z(x0,y0), z(x1,y1)] — the z-range scan is a candidate SUPERSET
  * (min/max-prunable on sorted files) and the exact box predicate
  * refilters it, so results equal the direct scan exactly.
  *
  * Exact integer arithmetic (shift/mask/add over disjoint bits), so any
  * SQL engine reproduces z-values bit-for-bit via [[zValueSql]],
  * generated from the same constants.
  */
object ZOrder {

  /** Bit-interleaved z-value of two non-negative keys, `bits` bits
    * each: bit j of x lands at position 2j, bit j of y at 2j+1.
    * Callers must mask inputs to `bits` (e.g. `x.bitwiseAND(lit(mask))`)
    * — higher bits would alias. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31)
    (0 until bits).flatMap { j =>
      Seq(shiftleft(shiftright(x, j).bitwiseAND(lit(1L)), 2 * j),
        shiftleft(shiftright(y, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }.reduce(_ + _) // disjoint bit positions: + == bitwise or
  }

  /** The identical expression in portable SQL — oracle building block. */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap { j =>
      Seq(s"((($x >> $j) & 1) << ${2 * j})",
        s"((($y >> $j) & 1) << ${2 * j + 1})")
    }.mkString(" + ")

  /** Box query through the z-curve: z-range prefilter (the part a
    * z-sorted layout answers from min/max stats) + exact refilter. */
  def boxFilter(df: DataFrame, x: Column, y: Column,
                x0: Long, x1: Long, y0: Long, y1: Long,
                bits: Int = 16): DataFrame = {
    val z = zValue(x, y, bits)
    df.where(z.between(
        lit(zOf(x0, y0, bits)), lit(zOf(x1, y1, bits))))
      .where(x.between(x0, x1) && y.between(y0, y1))
  }

  /** Driver-side z-value (bounds for [[boxFilter]]'s range). */
  def zOf(x: Long, y: Long, bits: Int = 16): Long =
    (0 until bits).map { j =>
      (((x >> j) & 1L) << (2 * j)) + (((y >> j) & 1L) << (2 * j + 1))
    }.sum

  /** Lay a table out along the z-curve: range-partitioned and sorted by
    * z, so each output file covers a compact z-interval and box queries
    * prune whole files/row-groups on the z column's min/max. */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, path: String,
                    bits: Int = 16): Unit = {
    val withZ = df.withColumn("z", zValue(x, y, bits))
    withZ.repartitionByRange(col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(path)
  }
}
