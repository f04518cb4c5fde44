package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative transitive closure to forest roots ("ur-conversation"
  * resolution).
  *
  * Rebuilds the capability of the reference's driver-controlled fixpoint
  * loop (`code/create-db/2_enrich_ur_conversation_ids.py:29-52`): a map of
  * `child conversation -> parent conversation` edges is collapsed so every
  * node points at the root of its tree, then joined back onto the fact
  * table with `COALESCE(root, own_id)`.
  *
  * Spark-first design notes (100 TB):
  *  - Pointer jumping (`anc := anc.anc`) doubles resolved path length per
  *    iteration, so convergence takes O(log2(max depth)) shuffle joins —
  *    the reference's single-step `UPDATE` loop is O(depth).
  *  - `localCheckpoint(eager = true)` after each iteration cuts the
  *    exponentially growing lineage, otherwise replanning cost dominates.
  *  - The join key (`anc`) is the shuffle key each round; AQE handles the
  *    shrinking change-set by coalescing partitions.
  *  - The reference has no cycle guard (mutual quotes would hang it); we
  *    stop at `maxIter` and leave remaining cycle members pointing at
  *    their current ancestor, which is deterministic because the jump is.
  */
object Closure {

  /** edges: (id, parent) with at most one parent per id (a forest, except
    * for possible cycles). Returns (id, root) for every id that appears
    * as a child; roots themselves are absent (as in the reference map).
    */
  def resolveRoots(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    var m = edges.select(col("id"), col("parent").as("anc")).localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // Lazy checkpoint: the convergence probe below is the job that
      // materializes this iteration's result (one job per iteration, and
      // the logical plan stays O(1) instead of growing with iterations).
      val next = m.as("a")
        .join(m.as("b"), col("a.anc") === col("b.id"), "left")
        .select(
          col("a.id"),
          coalesce(col("b.anc"), col("a.anc")).as("anc"),
          col("b.anc").isNotNull.as("_jumped"))
        .localCheckpoint(false)
      changed = next.where(col("_jumped")).limit(1).count()
      m = next.drop("_jumped")
      iter += 1
    }
    m.withColumnRenamed("anc", "root")
  }

  /** Attach `ur_conversation_id = COALESCE(root, conversation_id)` — the
    * reference's final enrichment join
    * (`2_enrich_ur_conversation_ids.py:49-52`). */
  def enrich(facts: DataFrame, edges: DataFrame, idCol: String,
             outCol: String = "ur_conversation_id", maxIter: Int = 50): DataFrame = {
    val roots = resolveRoots(edges, maxIter)
    facts.join(roots, facts(idCol) === roots("id"), "left")
      .withColumn(outCol, coalesce(col("root"), facts(idCol)))
      .drop("id", "root")
  }
}
