package graft.stats

import scala.util.Random

/** Empirical backing for the skew story (SURVEY §7.6.6, PLANS.md): one
  * pathological mega-conversation lands in a single task; this measures
  * that task's local cost at 1M nodes — time and a smoke check that the
  * iterative DFS (no recursion) survives extreme depth.
  */
class TreeStatsStressSpec extends graft.SparkSuite {

  test("1M-node random tree processes locally in bounded time") {
    val rnd = new Random(11)
    val n = 1000000
    val rows = new Array[TreeInput](n)
    var i = 0
    while (i < n) {
      val id = (i + 1).toLong
      // parent biased to recent nodes → realistic deep-ish trees
      val parent = if (i == 0) None
        else Some((math.max(1, i - rnd.nextInt(50))).toLong)
      val kind = rnd.nextInt(3)
      rows(i) = TreeInput(id, rnd.nextInt(1000).toLong,
        if (kind == 0) parent else None,
        if (kind == 1) parent else None,
        if (kind == 2) parent else None,
        rnd.nextInt(5), rnd.nextInt(5), rnd.nextInt(5), rnd.nextInt(5), 1L)
      i += 1
    }
    val t0 = System.nanoTime()
    val out = TreeStats.processGroup(rows.iterator)
    val count = out.length
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"1M-node group: $secs%.1f s")
    assert(count == n)
    // generous smoke bound — completion is the real assertion; timing is
    // informational (measured ~4 s uncontended, see PLANS.md)
    assert(secs < 600.0, s"mega-group took $secs s")
  }

  test("AQE never splits the tree-stats aggregate exchange under skew; computeHybrid is the real mitigation") {
    // VERDICT r15 item 5: SURVEY §7.6.6 documents "one mega-conversation
    // = one task" and PLANS.md said AQE skew handling applies to the
    // exchange — this pins what AQE can actually do there. Spark's skew
    // split (OptimizeSkewedJoin → PartialReducerPartitionSpec) exists
    // ONLY for join stages and rebalance: a final-aggregate partition is
    // structurally un-splittable because every buffer row of a group
    // must meet in one task. So even with AQE handed a pathologically
    // skewed fixture and a tiny advisory partition size, the executed
    // plan must contain NO partial-reducer specs — the mega group rides
    // one task by construction, and the engineered mitigation is
    // computeHybrid's outlier routing to the relational formulation
    // (TreeStatsIterative), not AQE.
    import spark.implicits._
    val rnd = new Random(7)
    def node(id: Long, group: Long, parent: Option[Long]) =
      TreeInput(id, rnd.nextInt(50).toLong, parent, None, None,
        rnd.nextInt(3), rnd.nextInt(3), rnd.nextInt(3), rnd.nextInt(3), group)
    // one 60k-row conversation + 300 twenty-row ones, same key space
    val big = (0 until 60000).map(i => node(1000000L + i, 1000000L,
      if (i == 0) None else Some(1000000L + rnd.nextInt(i))))
    val small = (1 to 300).flatMap { g =>
      val base = g * 1000L
      (0 until 20).map(i => node(base + i, base,
        if (i == 0) None else Some(base)))
    }
    val ds = spark.createDataset(rnd.shuffle(big ++ small))
    val prevAdvisory = spark.conf.getOption(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    try {
      val out = TreeStats.compute(ds)
      val n = out.count()
      assert(n == 66000L)
      val adaptive = out.queryExecution.executedPlan
        .collectFirst {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
        }.getOrElse(out.queryExecution.executedPlan)
      val specs = adaptive.collect {
        case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
          r.partitionSpecs
      }.flatten
      assert(!specs.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.PartialReducerPartitionSpec]),
        s"AQE split an aggregate partition — the un-splittable-group premise " +
          s"is wrong, revisit §7.6.6: $specs")
      // the mitigation that DOES split the work: route the outlier group
      // to the relational path; results must match (doubles to the two
      // formulations' documented 1e-9 relative tolerance — different
      // summation orders, same arithmetic)
      import org.apache.spark.sql.functions.{abs, col, greatest, lit}
      val viaHybrid = TreeStatsIterative.computeHybrid(ds, threshold = 1000L)
      val j = out.toDF().as("a").join(viaHybrid.toDF().as("b"),
        col("a.tweet_id") === col("b.tweet_id"), "full")
      val diverges = out.toDF().schema.fields
        .filter(_.name != "tweet_id").map { f =>
          if (f.dataType == org.apache.spark.sql.types.DoubleType)
            abs(col(s"a.${f.name}") - col(s"b.${f.name}")) >
              lit(1e-9) * greatest(lit(1.0), abs(col(s"b.${f.name}")))
          else col(s"a.${f.name}") =!= col(s"b.${f.name}")
        }.reduce(_ || _)
      val bad = j.where(col("a.tweet_id").isNull || col("b.tweet_id").isNull
        || diverges)
      assert(bad.isEmpty,
        s"hybrid routing diverged: ${bad.limit(3).collect().mkString("\n")}")
    } finally {
      prevAdvisory match {
        case Some(v) => spark.conf.set(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", v)
        case None => spark.conf.unset(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      }
    }
  }

  test("100k-node pure chain (maximum depth) survives the iterative DFS") {
    val n = 100000
    val rows = (1 to n).map(i =>
      TreeInput(i.toLong, 0L, if (i == 1) None else Some((i - 1).toLong),
        None, None, 1, 1, 1, 1, 1L))
    val out = TreeStats.processGroup(rows.iterator).toArray
    val root = out.find(_.tweet_id == 1L).get
    assert(root.descendants == n - 1)
    assert(root.max_depth == n - 1)
  }
}
