package graft.graph

import org.apache.spark.sql.DataFrame
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
  * bit-for-bit (the q65 oracle is the same recurrence unrolled,
  * generated from the same constants).
  *
  * Per iteration: r'(v) = base + Σ_{u→v} (r(u)·dampNum) div (dampDen·od(u)),
  * base = (scale·(dampDen−dampNum)) div dampDen. Dangling-node mass is
  * dropped (not redistributed) — the standard simplification; document
  * rank ORDER is unaffected on graphs where dangling nodes are leaves.
  *
  * Spark-first shape (100 TB): nodes/edges/out-degrees are computed once
  * and localCheckpoint'd (reused every round without re-scanning the
  * source); each iteration is one equi-join on `src` (ranks are
  * pre-partitioned by the join key from the previous round's aggregate)
  * + one partial-aggregated shuffle on `dst` + one left join back to the
  * node set. Lineage is truncated per round, so plan cost is O(1) per
  * iteration, same discipline as [[Closure]].
  */
object PageRank {

  /** @param edges (src, dst) directed edges; parallel edges count twice.
    * @return (id, r) for every node appearing in `edges`, r scaled by
    *         `scale` (r = `scale` means rank 1.0).
    */
  def run(edges: DataFrame, iters: Int, scale: Long = 1000000L,
          dampNum: Long = 17L, dampDen: Long = 20L): DataFrame = {
    require(iters >= 0 && dampNum > 0 && dampDen > dampNum && scale > 0)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint(true)
    val base = scale * (dampDen - dampNum) / dampDen

    var ranks = nodes.select(col("id"), lit(scale).as("r"))
    for (_ <- 1 to iters) {
      val inMass = e
        .join(ranks, e("src") === ranks("id"))
        .join(outdeg, "src")
        .select(col("dst"),
          expr(s"(r * ${dampNum}L) div (${dampDen}L * od)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      ranks = nodes
        .join(inMass, nodes("id") === inMass("dst"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("in_mass"), lit(0L))).as("r"))
        .localCheckpoint(false)
    }
    ranks
  }
}
