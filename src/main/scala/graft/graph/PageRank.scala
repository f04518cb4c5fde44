package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Damped PageRank over a directed edge list — the graph-centrality
  * companion to [[Closure]] (influence/importance scoring of the reply
  * graph; a training pipeline uses it to weight documents by citation /
  * link authority).
  *
  * Exact-integer formulation: ranks are scaled longs (`scale` = 1.0)
  * and the damping factor is the rational `dampNum/dampDen`, so every
  * iteration is integer multiply + integer div + long sum — no
  * floating-point accumulation, which makes results independent of
  * partitioning/summation order and lets a SQL engine reproduce them
  * bit-for-bit (the q65/q93 oracles are the same recurrence unrolled,
  * generated from the same constants).
  *
  * Per iteration: r'(v) = base + Σ_{u→v} (r(u)·dampNum) div (dampDen·od(u)),
  * base = (scale·(dampDen−dampNum)) div dampDen. Dangling-node (sink)
  * mass is handled two ways:
  *  - default: dropped — the standard simplification; document rank
  *    ORDER is unaffected on graphs where dangling nodes are leaves;
  *  - `redistributeDangling = true`: every node additionally receives
  *    (D·dampNum) div (dampDen·N), where D = Σ r(u) over sinks u and
  *    N = node count — the textbook redistribution, needed when sinks
  *    are not leaves (real citation/link graphs), same exact-integer
  *    discipline (the share is a single integer div applied uniformly).
  *
  * Spark-first shape (100 TB): the static relations are prepared ONCE —
  * out-degrees folded into the edge list, the result hash-partitioned
  * and sorted by `src`, the node set left partitioned by `id` from its
  * distinct — and localCheckpoint'd. `LogicalRDD` preserves the
  * partitioning and ordering across the checkpoint, so every
  * iteration's rank join reuses it: ranks arrive partitioned by `id`
  * (= the join key) from the previous round's node join, and the ONLY
  * hash exchange per iteration is the partial-aggregated in-mass
  * shuffle on `dst` (asserted in PageRankSpec; the redistributed
  * variant adds a one-row sink-mass aggregate broadcast back — bytes,
  * not data). The edge relation — the 100 TB side — is never
  * re-shuffled and never re-sorted after round 0. Lineage is truncated
  * per round, so plan cost is O(1) per iteration, same discipline as
  * [[Closure]].
  */
object PageRank {

  /** @param edges (src, dst) directed edges; parallel edges count twice.
    * @return (id, r) for every node appearing in `edges`, r scaled by
    *         `scale` (r = `scale` means rank 1.0).
    *
    * The returned relation is MATERIALIZED (final round eagerly
    * localCheckpoint'd) while the loop's conf scope is still in force:
    * callers invariably wrap the result (`select`/alias), and a lazy
    * plan built after the conf restore would re-shuffle the
    * checkpointed static sides at conf width — the exact seam ADVICE r3
    * flagged. Wrapping a `LogicalRDD` can't re-plan the loop.
    */
  def run(edges: DataFrame, iters: Int, scale: Long = 1000000L,
          dampNum: Long = 17L, dampDen: Long = 20L,
          redistributeDangling: Boolean = false): DataFrame = {
    validate(iters, scale, dampNum, dampDen)
    withLoopConfs(edges) { (spark, e, nPart) =>
      runLoop(e, iters, scale, dampNum, dampDen, nPart, redistributeDangling)
        .localCheckpoint(true)
    }
  }

  /** Fail fast on parameters that would otherwise corrupt silently:
    * dampDen <= dampNum makes the teleport base negative, scale <= 0
    * zeroes every rank, and a negative iteration count is a caller bug.
    * (Integer div never raises on these — the loop would just produce
    * garbage ranks, so the contract is enforced here.) */
  private def validate(iters: Int, scale: Long, dampNum: Long, dampDen: Long): Unit =
    require(iters >= 0 && scale > 0 && dampNum > 0 && dampDen > dampNum,
      s"PageRank: need iters >= 0, scale > 0, 0 < dampNum < dampDen; " +
        s"got iters=$iters scale=$scale damp=$dampNum/$dampDen")

  /** [[run]] without the final materialization: pins the last round's
    * physical plan (still under the loop confs) but returns it LAZY, so
    * PageRankSpec can assert the per-iteration plan shape. Production
    * callers use [[run]]. */
  private[graph] def runRaw(edges: DataFrame, iters: Int, scale: Long = 1000000L,
                            dampNum: Long = 17L, dampDen: Long = 20L,
                            redistributeDangling: Boolean = false): DataFrame = {
    validate(iters, scale, dampNum, dampDen)
    withLoopConfs(edges) { (spark, e, nPart) =>
      val ranks = runLoop(e, iters, scale, dampNum, dampDen, nPart, redistributeDangling)
      // planning is lazy — force it inside the conf scope
      ranks.queryExecution.executedPlan
      ranks
    }
  }

  /** Materializes the edge relation, sizes the loop parallelism, and
    * runs `body` with AQE off and `spark.sql.shuffle.partitions` pinned
    * to that width, restoring both confs afterwards.
    *
    * AQE is off for the loop because AdaptiveSparkPlanExec does not
    * surface its final plan's outputPartitioning, so a checkpoint taken
    * under AQE captures UnknownPartitioning and every round silently
    * re-shuffles the static sides. These per-round plans are
    * hand-shaped (explicit layout, partial-aggregated shuffle), so AQE
    * has nothing to add. The edge lineage (often a window/join chain)
    * is materialized ONCE here; the sizing count and every derivation
    * in the loop (eod, out-degrees, node set) read the cached relation
    * instead of re-executing the upstream plan.
    */
  private def withLoopConfs(edges: DataFrame)
                           (body: (SparkSession, DataFrame, Int) => DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    // size the loop's parallelism to the data (AQE is off inside, so
    // nothing coalesces for us): ~1M edge-rows per partition, capped by
    // the session's shuffle parallelism — at cluster scale the cap
    // binds, at fixture scale the loop stops paying full-width fixed
    // costs per round for kilobyte stages. Floor 2, not 1: a
    // one-partition layout is captured as SinglePartition, which
    // EnsureRequirements refuses to treat as co-partitioned for a
    // shuffle join — it would re-exchange BOTH sides every round.
    val nPart = math.max(2, math.min(
      spark.sessionState.conf.numShufflePartitions,
      (e.count() / 1000000L).toInt + 1))
    val aqeKey = "spark.sql.adaptive.enabled"
    val partKey = "spark.sql.shuffle.partitions"
    val prevAqe = spark.conf.getOption(aqeKey)
    val prevPart = spark.conf.getOption(partKey)
    spark.conf.set(aqeKey, "false")
    spark.conf.set(partKey, nPart.toString)
    try body(spark, e, nPart)
    finally {
      (prevAqe match {
        case Some(v) => spark.conf.set(aqeKey, v)
        case None => spark.conf.unset(aqeKey)
      }): Unit
      prevPart match {
        case Some(v) => spark.conf.set(partKey, v)
        case None => spark.conf.unset(partKey)
      }
    }
  }

  /** `e` must be a materialized (checkpointed) (src, dst) relation. */
  private def runLoop(e: DataFrame, iters: Int, scale: Long,
                      dampNum: Long, dampDen: Long, nPart: Int,
                      redistributeDangling: Boolean): DataFrame = {
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    // contribution edges: out-degree folded in once, laid out by the
    // per-iteration join key — iterations probe it in place. The
    // partition count is EXPLICIT: an AQE-coalesced layout would not
    // co-partition with later exchanges and the reuse would silently
    // turn back into a per-round shuffle of the big side.
    val eod = e.join(outdeg, "src")
      .select(col("src"), col("dst"), col("od"))
      .repartition(nPart, col("src"))
      .sortWithinPartitions(col("src"))
      .localCheckpoint(true)
    // same explicit layout for the node set, on its join key
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .repartition(nPart, col("id"))
      .dropDuplicates("id")
      .sortWithinPartitions(col("id"))
      .localCheckpoint(true)
    val base = scale * (dampDen - dampNum) / dampDen
    // sink handling statics: dangling-ness never changes, so the sink
    // id set is carved out once, co-laid-out with ranks on `id`; the
    // node count is one driver count of an already-materialized
    // relation. Neither is touched unless redistribution is on.
    lazy val nNodes = nodes.count()
    lazy val dangIds = nodes
      .join(e.select(col("src").as("id")), Seq("id"), "left_anti")
      .repartition(nPart, col("id"))
      .sortWithinPartitions(col("id"))
      .localCheckpoint(true)

    var ranks = nodes.select(col("id"), lit(scale).as("r"))
    for (i <- 1 to iters) {
      val inMass = eod
        .join(ranks, eod("src") === ranks("id"))
        .select(col("dst"),
          expr(s"(r * ${dampNum}L) div (${dampDen}L * od)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      val withBase = nodes
        .join(inMass, nodes("id") === inMass("dst"), "left")
      ranks =
        if (redistributeDangling) {
          // sink mass this round: a co-partitioned semi-join (no new
          // exchange on the rank side) reduced to ONE row, broadcast
          // back as a cross join — every node gets the identical
          // integer share, so exactness and order-independence hold
          val dmass = ranks.join(dangIds, Seq("id"), "left_semi")
            .agg(coalesce(sum(col("r")), lit(0L)).as("dm"))
          withBase.crossJoin(broadcast(dmass))
            .select(col("id"),
              (lit(base) + coalesce(col("in_mass"), lit(0L)) +
                expr(s"(dm * ${dampNum}L) div (${dampDen}L * ${nNodes}L)")).as("r"))
        } else {
          withBase.select(col("id"),
            (lit(base) + coalesce(col("in_mass"), lit(0L))).as("r"))
        }
      // the final round's result goes straight to the caller — only
      // rounds that feed another iteration need their lineage cut (and
      // leaving the last plan intact lets tests assert its shape)
      if (i < iters) ranks = ranks.localCheckpoint(false)
    }
    ranks
  }
}
