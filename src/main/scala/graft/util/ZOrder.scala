package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve utilities: interleave the bits of n dimension
  * keys so that rows close in EVERY dimension are close in the
  * one-dimensional sort order. Writing a table sorted by z-value
  * clusters multi-dimensional locality into parquet row groups, so a
  * box predicate on the dimensions prunes via min/max statistics on a
  * single column — the layout trick Delta's OPTIMIZE ZORDER and
  * Iceberg's sort orders use, here as a plain column expression.
  *
  * Dimensions carry PER-DIM BIT BUDGETS: a coarse dimension (language,
  * source) spends fewer bits than a fine one (time, user), which keeps
  * the total within one long while spending curve resolution where the
  * data has it. Equal budgets give the classic round-robin Morton
  * layout; the level-order interleave (at level j, every dim with
  * budget > j contributes its j-th bit, in dim order) preserves the
  * per-dimension bit order, so z is monotone in each coordinate with
  * the others fixed — which is exactly what the box-superset law needs.
  *
  * Query pattern (the superset property, verified by q79/q95's oracles
  * and ZOrderSpec): for a box ∏[lo_k, hi_k], every row in the box has
  * z ∈ [z(lo_1..lo_n), z(hi_1..hi_n)] — the z-range scan is a candidate
  * SUPERSET (min/max-prunable on sorted files) and the exact box
  * predicate refilters it, so results equal the direct scan exactly.
  *
  * Exact integer arithmetic (shift/mask/add over disjoint bits), so any
  * SQL engine reproduces z-values bit-for-bit via [[zValueSqlN]],
  * generated from the same constants.
  */
object ZOrder {

  /** (dim index, source bit, destination position) for each interleaved
    * bit — the ONE definition of the curve layout; the column, SQL and
    * driver forms all read it, so they cannot drift. */
  private def layout(budgets: Seq[Int]): Seq[(Int, Int, Int)] = {
    require(budgets.nonEmpty && budgets.forall(_ >= 1),
      s"every dimension needs a positive bit budget: $budgets")
    val total = budgets.sum
    require(total <= 62, s"total z bits $total exceed a positive long (62)")
    val buf = Seq.newBuilder[(Int, Int, Int)]
    var p = 0
    for (j <- 0 until budgets.max; k <- budgets.indices if budgets(k) > j) {
      buf += ((k, j, p))
      p += 1
    }
    buf.result()
  }

  /** Interleaved z-value of n non-negative keys with per-dim budgets.
    * Callers must mask inputs to their budgets (e.g.
    * `x.bitwiseAND(lit(mask))`) — higher bits would alias; use
    * [[boxFilterN]] for queries, which enforces the bounds.
    *
    * Evaluates through the compact [[graft.functions.ZValue]] codegen
    * expression, NOT the composed shift/mask tree: a box query carries z
    * in both filter and projection, and twice-inlining the 32+-term tree
    * pushes the whole generated stage past HotSpot's huge-method JIT
    * ceiling — the stage then runs interpreted (~10× slower) with no
    * warning. See [[zValueSpecN]] for the composed reference form.
    * Resolves against the thread's active session (query/write paths
    * always have one). */
  def zValueN(dims: Seq[Column], budgets: Seq[Int]): Column = {
    require(dims.size == budgets.size, "one budget per dimension")
    val lay = layout(budgets).flatMap { case (k, j, p) => Seq(k, j, p) }.toArray
    graft.functions.ZValue.zCol(
      org.apache.spark.sql.SparkSession.active, dims, lay)
  }

  /** The composed built-in form of [[zValueN]] — the cross-engine
    * SPECIFICATION the compact expression must match bit-for-bit
    * (ZOrderSpec pins equality on random inputs); kept for reference
    * and parity testing, not for hot paths (see [[zValueN]]'s JIT
    * note). */
  def zValueSpecN(dims: Seq[Column], budgets: Seq[Int]): Column = {
    require(dims.size == budgets.size, "one budget per dimension")
    layout(budgets).map { case (k, j, p) =>
      shiftleft(shiftright(dims(k), j).bitwiseAND(lit(1L)), p)
    }.reduce(_ + _) // disjoint bit positions: + == bitwise or
  }

  /** The identical expression in portable SQL — oracle building block. */
  def zValueSqlN(dims: Seq[String], budgets: Seq[Int]): String = {
    require(dims.size == budgets.size, "one budget per dimension")
    layout(budgets).map { case (k, j, p) =>
      s"(((${dims(k)} >> $j) & 1) << $p)"
    }.mkString(" + ")
  }

  /** Driver-side z-value (bounds for [[boxFilterN]]'s range). */
  def zOfN(vals: Seq[Long], budgets: Seq[Int]): Long = {
    require(vals.size == budgets.size, "one budget per dimension")
    layout(budgets).map { case (k, j, p) =>
      ((vals(k) >> j) & 1L) << p
    }.sum
  }

  /** Box query through the z-curve: z-range prefilter (the part a
    * z-sorted layout answers from min/max stats) + exact refilter.
    * `dims` is (column, lo, hi) per dimension. Bounds MUST fit the
    * budget — [[zOfN]] would silently drop higher bits and the z-range
    * would stop being a superset of the box, silently missing rows —
    * so they are validated here, not assumed.
    */
  def boxFilterN(df: DataFrame, dims: Seq[(Column, Long, Long)],
                 budgets: Seq[Int]): DataFrame = {
    require(dims.size == budgets.size, "one budget per dimension")
    dims.zip(budgets).zipWithIndex.foreach { case (((_, lo, hi), b), k) =>
      require(lo >= 0 && lo <= hi && hi < (1L << b),
        s"dim $k bounds [$lo, $hi] outside [0, 2^$b)")
    }
    val z = zValueN(dims.map(_._1), budgets)
    df.where(z.between(
        lit(zOfN(dims.map(_._2), budgets)), lit(zOfN(dims.map(_._3), budgets))))
      .where(dims.map { case (c, lo, hi) => c.between(lo, hi) }.reduce(_ && _))
  }

  // ── 2-d forms (budgets (bits, bits) of the n-dim layout: x bits land
  //    at even positions, y at odd — the classic Morton interleave) ────

  /** Bit-interleaved z-value of two non-negative keys, `bits` bits
    * each. Callers must mask inputs to `bits`. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31)
    zValueN(Seq(x, y), Seq(bits, bits))
  }

  /** The identical expression in portable SQL — oracle building block. */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    zValueSqlN(Seq(x, y), Seq(bits, bits))

  /** Box query through the z-curve; bounds validated against `bits`
    * (see [[boxFilterN]]). */
  def boxFilter(df: DataFrame, x: Column, y: Column,
                x0: Long, x1: Long, y0: Long, y1: Long,
                bits: Int = 16): DataFrame =
    boxFilterN(df, Seq((x, x0, x1), (y, y0, y1)), Seq(bits, bits))

  /** Driver-side z-value (bounds for [[boxFilter]]'s range). */
  def zOf(x: Long, y: Long, bits: Int = 16): Long =
    zOfN(Seq(x, y), Seq(bits, bits))

  /** Lay a table out along the n-dim z-curve: range-partitioned and
    * sorted by z, so each output file covers a compact z-interval and
    * box queries prune whole files/row-groups on the z column's
    * min/max.
    *
    * File-size control — pruning only pays if files are WORTH pruning:
    * `files > 0` pins the range-partition count (one file per
    * partition), the knob that stops a wide session (or a 1000-executor
    * cluster) from shattering a modest table into thousands of
    * KB-sized files whose open/footer cost dwarfs the pruned reads;
    * `maxRecordsPerFile > 0` caps the other direction, re-splitting any
    * oversized range so single files stay row-group-sized. Defaults (0)
    * keep Spark's session behavior. */
  def writeZOrderedN(df: DataFrame, dims: Seq[Column], budgets: Seq[Int],
                     path: String, files: Int = 0,
                     maxRecordsPerFile: Long = 0): Unit = {
    val withZ = df.withColumn("z", zValueN(dims, budgets))
    val ranged = if (files > 0) withZ.repartitionByRange(files, col("z"))
                 else withZ.repartitionByRange(col("z"))
    ranged.sortWithinPartitions(col("z"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** 2-d [[writeZOrderedN]]. */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, path: String,
                    bits: Int = 16, files: Int = 0,
                    maxRecordsPerFile: Long = 0): Unit =
    writeZOrderedN(df, Seq(x, y), Seq(bits, bits), path, files, maxRecordsPerFile)
}
