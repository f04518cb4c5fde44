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
