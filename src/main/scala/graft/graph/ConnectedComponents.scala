package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Min-label propagation connected components over an undirected edge
  * list — the clustering step that turns near-duplicate PAIRS (Jaccard /
  * LSH / cosine joins) into dedup groups with one canonical survivor.
  *
  * Each propagation step every node takes the minimum label among
  * itself and its neighbors; fixpoint in O(component diameter) steps,
  * batched TWO steps per materialized job (so `maxIter` counts JOBS —
  * up to 2·maxIter propagations). Near-dup
  * components are dense and tiny (diameter ≤ 3-4), so this converges in
  * a few shuffles even at 100 TB — no GraphX dependency, plain
  * DataFrame joins, lineage cut per iteration like [[Closure]].
  * Convergence detection counts CHANGED labels (new label < the node's
  * own previous label, carried through the aggregate) — airtight at any
  * id magnitude, unlike a label-sum probe which could in principle alias
  * under 64-bit overflow.
  */
object ConnectedComponents {

  /** edges: (a, b) undirected pairs. Returns (id, component) for every
    * endpoint, where component = the minimum id in the component.
    * `maxIter` caps MATERIALIZED JOBS, each of which runs two
    * propagation steps — the default 50 covers diameters up to 100. */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("lab", col("id")).localCheckpoint(true)
    var iter = 0
    var converged = labels.isEmpty
    // one propagation step; the node's own row alone carries `own`
    // (= its label BEFORE the step), so `lab < own` marks a change
    def prop(l: DataFrame): DataFrame =
      sym.join(l, sym("b") === l("id"))
        .select(sym("a").as("id"), col("lab"), lit(null).cast("long").as("own"))
        .union(l.select(col("id"), col("lab"), col("lab").as("own")))
        .groupBy(col("id")).agg(min(col("lab")).as("lab"), min(col("own")).as("own"))
    // pointer-halving SHORTCUT (r20): lab := lab(lab). Every label IS a
    // node id of the same component (initial lab = id; prop only ever
    // propagates existing labels), so the label's own row exists and
    // carries a same-component label that is ≤ it — the jump stays
    // monotone and component-confined, and the fixpoint test below is
    // untouched (a no-op prop step still proves its input stable, and a
    // stable labeling is constant per component = the min id). Plain
    // min-label propagation needs O(component diameter) steps — a
    // 100 TB near-dup CHAIN (doc A ~ B ~ C ~ ...) pays one edges-sized
    // shuffle per step; with the shortcut the label forest halves in
    // height per round, so rounds (and edge shuffles) drop to
    // O(log diameter). Measured r20 at sf0.1: q126's CC loop 11 → 5
    // materialized rounds, see OPTIMIZATION_r20.md.
    def shortcut(l: DataFrame): DataFrame =
      l.as("a").join(
          l.select(col("id").as("_sid"), col("lab").as("_slab")).as("b"),
          col("a.lab") === col("_sid"), "left")
        .select(col("a.id").as("id"),
          coalesce(col("_slab"), col("a.lab")).as("lab"))
    while (!converged && iter < maxIter) {
      // TWO propagations (+ one shortcut) per materialized job (the
      // Closure trick): the convergence probe on the second prop is the
      // one job that materializes all three. `own` is the label
      // entering the final prop, so changed==0 means that prop was a
      // no-op — and a no-op step proves its INPUT was already the
      // fixpoint, so stopping here is exact even when earlier steps
      // still changed labels.
      val next = prop(shortcut(prop(labels).drop("own")))
        .localCheckpoint(false)
      val changed = next.agg(count(when(col("lab") < col("own"), 1))).head().getLong(0)
      converged = changed == 0L
      labels = next.drop("own")
      iter += 1
    }
    if (!converged && iter >= maxIter)
      System.err.println(
        s"[ConnectedComponents] job cap $maxIter (= ${2 * maxIter} propagation steps) " +
          s"hit before convergence — labels for components with diameter > ${2 * maxIter} " +
          "are not minimal")
    labels.withColumnRenamed("lab", "component")
  }

  /** INCREMENTAL component maintenance: merge a NEW edge batch into an
    * existing labeling without re-traversing the settled graph. New
    * edges may BRIDGE existing components (a near-dup batch linking
    * two old clusters), so unlike forest closure this needs a real
    * merge step — but only over the CONTRACTED graph:
    *
    *  - each new edge's endpoints map through the old labeling
    *    (identity for genuinely new ids) — old components collapse to
    *    their single label node, so the contracted edge set is
    *    batch-sized no matter how large the settled graph is;
    *  - [[run]] on the contracted edges computes the merged labels in
    *    O(log batch-diameter) batch-sized jobs. Labels stay exact
    *    min-ids: an old label is the min of its component, so the min
    *    over merged {labels ∪ new ids} is the true global min;
    *  - old nodes then take ONE label-keyed equi-join to lift their
    *    label onto the merged component (labels untouched by the batch
    *    pass through); genuinely new ids come straight from the
    *    contracted result.
    *
    * Result is EXACTLY `run(old ∪ new)` (spec + q181's shared batch
    * oracle pin hash-equality). The settled labeling is probed twice
    * (endpoint mapping, label lift) and never rewritten; both probes
    * are equi-joins on its own key columns.
    *
    * `oldLabels`: (id, component) — [[run]]'s output for the settled
    * edge set. `newEdges`: (a, b) undirected new pairs.
    */
  def addEdges(oldLabels: DataFrame, newEdges: DataFrame,
               maxIter: Int = 50): DataFrame = {
    val lab = oldLabels.select(col("id"), col("component"))
    val (cc, newIds) = mergeBatch(lab, newEdges, maxIter)
    val merged = lab
      .join(broadcast(cc.select(col("id").as("component"),
        col("component").as("_new"))), Seq("component"), "left")
      .select(col("id"), coalesce(col("_new"), col("component")).as("component"))
    val newNodes = cc.join(broadcast(newIds), Seq("id"))
    merged.unionByName(newNodes)
  }

  /** The UPSERT a batch contributes — (id, component) for every node
    * whose label the batch may have changed (old nodes in merged
    * components) plus the genuinely new nodes; applying it key-wise
    * over the settled store reproduces [[addEdges]] exactly
    * (spec-pinned law). This is the relation a production deployment
    * writes per batch: batch-sized output, the settled labeling
    * streamed ONCE (the endpoint probe) with ZERO corpus-side
    * shuffles — every big-side join has the batch side broadcast.
    */
  def addEdgesDelta(oldLabels: DataFrame, newEdges: DataFrame,
                    maxIter: Int = 50): DataFrame = {
    val lab = oldLabels.select(col("id"), col("component"))
    val (cc, newIds) = mergeBatch(lab, newEdges, maxIter)
    // old nodes in merged components: their component label appears in
    // the contracted result — batch-sized relation broadcast, settled
    // labeling streams once
    val touched = lab
      .join(broadcast(cc.select(col("id").as("component"),
        col("component").as("_new"))), Seq("component"))
      .select(col("id"), col("_new").as("component"))
    touched.unionByName(cc.join(broadcast(newIds), Seq("id")))
  }

  /** Shared merge core: contract new-edge endpoints through the old
    * labeling (ONE streamed pass of `lab` against a broadcast of the
    * batch's endpoint set — no corpus shuffle), run CC over the
    * batch-sized contracted edges. Returns (contracted components,
    * genuinely-new ids). An endpoint absent from `lab` is new-or-
    * isolated and participates under its own id — exactly [[run]]'s
    * semantics for the full edge set. */
  private def mergeBatch(lab: DataFrame, newEdges: DataFrame,
                         maxIter: Int): (DataFrame, DataFrame) = {
    val keys = newEdges.select(col("a").as("k"))
      .union(newEdges.select(col("b").as("k"))).distinct()
      .localCheckpoint(true)
    val kmap = lab.join(broadcast(keys), col("id") === col("k"))
      .select(col("k"), col("component").as("kc"))
      .localCheckpoint(true)
    val contracted = newEdges.select(col("a"), col("b"))
      .join(broadcast(kmap.select(col("k").as("a"), col("kc").as("_ca"))),
        Seq("a"), "left")
      .join(broadcast(kmap.select(col("k").as("b"), col("kc").as("_cb"))),
        Seq("b"), "left")
      .select(coalesce(col("_ca"), col("a")).as("a"),
        coalesce(col("_cb"), col("b")).as("b"))
    val newIds = keys.join(kmap, Seq("k"), "left_anti")
      .select(col("k").as("id"))
    (run(contracted, maxIter), newIds)
  }
}
