package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Min-label propagation connected components over an undirected edge
  * list — the clustering step that turns near-duplicate PAIRS (Jaccard /
  * LSH / cosine joins) into dedup groups with one canonical survivor.
  *
  * Each iteration every node takes the minimum label among itself and
  * its neighbors; fixpoint in O(component diameter) iterations. Near-dup
  * components are dense and tiny (diameter ≤ 3-4), so this converges in
  * a few shuffles even at 100 TB — no GraphX dependency, plain
  * DataFrame joins, lineage cut per iteration like [[Closure]].
  * Convergence detection is a single `sum(label)` aggregate: labels
  * only ever decrease, so the sum is strictly monotone until fixpoint.
  */
object ConnectedComponents {

  /** edges: (a, b) undirected pairs. Returns (id, component) for every
    * endpoint, where component = the minimum id in the component. */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("lab", col("id")).localCheckpoint(true)
    // sum over zero rows is NULL — empty edge list means nothing to label
    def labelSum(df: DataFrame): Long = {
      val r = df.agg(sum("lab")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = prevSum == 0L
    while (!converged && iter < maxIter) {
      val next = sym.join(labels, sym("b") === labels("id"))
        .select(sym("a").as("id"), col("lab"))
        .union(labels.select(col("id"), col("lab")))
        .groupBy(col("id")).agg(min(col("lab")).as("lab"))
        .localCheckpoint(false)
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    if (!converged && iter >= maxIter)
      System.err.println(
        s"[ConnectedComponents] iteration cap $maxIter hit before convergence — " +
          "labels for components with diameter > cap are not minimal")
    labels.withColumnRenamed("lab", "component")
  }
}
