package graft.stats

import scala.util.Random

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Parity + bounded-memory coverage for the relational tree-statistics
  * escape hatch: the iterative-join formulation must agree with the
  * in-memory aggregate on every acyclic shape (longs exactly, MAD doubles
  * to float-summation tolerance), and a mega-group must flow through it
  * as ordinary shuffled aggregates rather than one giant task buffer.
  *
  * Default mega-group size is 10^6 to keep CI latency sane on a noisy
  * sandbox; GRAFT_STRESS_N overrides (validated manually at 10^7 — see
  * the timing note in PLANS.md).
  */
class TreeStatsIterativeSpec extends SparkSuite {

  private def row(id: Long, reply: Option[Long] = None, rt: Option[Long] = None,
                  q: Option[Long] = None, author: Long = 0,
                  counts: (Long, Long, Long, Long) = (0, 0, 0, 0),
                  group: Long = 1): TreeInput =
    TreeInput(id, author, reply, rt, q, counts._1, counts._2, counts._3, counts._4, group)

  private val longCols = Seq("children", "ur_children", "descendants",
    "ur_descendants", "leaf_descendants", "ur_leaf_descendants", "max_depth",
    "ur_max_depth", "t_authors", "ur_t_authors", "t_reply_count",
    "ur_t_reply_count", "t_quote_count", "ur_t_quote_count", "t_like_count",
    "ur_t_like_count", "t_retweet_count", "ur_t_retweet_count")
  private val doubleCols = Seq("branching_factor", "ur_branching_factor",
    "mean_depth", "ur_mean_depth", "depth_mad", "ur_depth_mad",
    "mean_reply_count", "ur_mean_reply_count", "reply_count_mad",
    "ur_reply_count_mad", "mean_quote_count", "ur_mean_quote_count",
    "quote_count_mad", "ur_quote_count_mad", "mean_like_count",
    "ur_mean_like_count", "like_count_mad", "ur_like_count_mad",
    "mean_retweet_count", "ur_mean_retweet_count", "retweet_count_mad",
    "ur_retweet_count_mad")

  /** Distributed comparison (no driver collect): full outer join on
    * tweet_id, then one predicate over all 41 columns. */
  private def assertSame(got: Dataset[TreeStatsRow], want: Dataset[TreeStatsRow]): Unit = {
    val j = got.toDF().as("a")
      .join(want.toDF().as("b"), col("a.tweet_id") === col("b.tweet_id"), "full")
    val missing: Column = col("a.tweet_id").isNull || col("b.tweet_id").isNull
    val longBad = longCols.map(c => col(s"a.$c") =!= col(s"b.$c")).reduce(_ || _)
    val dblBad = doubleCols.map { c =>
      abs(col(s"a.$c") - col(s"b.$c")) >
        lit(1e-9) * greatest(lit(1.0), abs(col(s"b.$c")))
    }.reduce(_ || _)
    val bad = j.where(missing || longBad || dblBad)
    assert(bad.isEmpty, s"diverging rows:\n${bad.limit(5).collect().mkString("\n")}")
  }

  test("random cross-linked forests: iterative == in-memory aggregate") {
    import spark.implicits._
    val rnd = new Random(23)
    val rows = (1 to 400).map { i =>
      val group = i % 16
      val pool = (1 until i).filter(j => j % 16 == group)
      val parent =
        if (pool.nonEmpty && rnd.nextDouble() < 0.8)
          Some(pool(rnd.nextInt(pool.size)).toLong)
        else if (rnd.nextDouble() < 0.1) Some(900000L + rnd.nextInt(3)) // absent parent
        else None
      val kind = rnd.nextInt(3)
      row(i,
        reply = if (kind == 0) parent else None,
        rt = if (kind == 1) parent else None,
        q = if (kind == 2) parent else None,
        author = rnd.nextInt(6),
        counts = (rnd.nextInt(5), rnd.nextInt(5), rnd.nextInt(5), rnd.nextInt(5)),
        group = group)
    }
    val ds = spark.createDataset(rows).repartition(8)
    assertSame(TreeStatsIterative.compute(ds), TreeStats.compute(ds))
  }

  test("deep chain crosses many doubling rounds") {
    import spark.implicits._
    // depth 300 → 9 doublings; mixes reply and ur edges along the chain
    val rows = (1 to 300).map { i =>
      val parent = if (i == 1) None else Some((i - 1).toLong)
      row(i,
        reply = if (i % 4 != 0) parent else None,
        q = if (i % 4 == 0) parent else None,
        author = i % 7, counts = (i % 3, i % 5, i % 2, i % 4))
    }
    val ds = spark.createDataset(rows)
    assertSame(TreeStatsIterative.compute(ds), TreeStats.compute(ds))
  }

  test("forced sort-merge arm: doubling join executes SMJ, output unchanged, confs restored") {
    import spark.implicits._
    // The cluster-scale strategy gate (VERDICT r16 item 2): at 100 TB
    // the doubling join's build side exceeds the broadcast threshold
    // and the loop runs sort-merge (the adjudicated SCALEPROBE_r16b 10×
    // sig mismatch). computeSortMerge must (a) actually EXECUTE that
    // join shape — asserted on the executed-plan histogram, not plan
    // text, so AQE can't silently demote it back to broadcast — and
    // (b) produce the identical 41-column result.
    val rnd = new Random(31)
    val rows = (1 to 300).map { i =>
      val group = i % 8
      val pool = (1 until i).filter(j => j % 8 == group)
      val parent =
        if (pool.nonEmpty && rnd.nextDouble() < 0.8)
          Some(pool(rnd.nextInt(pool.size)).toLong)
        else None
      row(i, reply = if (i % 3 != 0) parent else None,
        q = if (i % 3 == 0) parent else None,
        author = rnd.nextInt(5),
        counts = (rnd.nextInt(4), rnd.nextInt(4), rnd.nextInt(4), rnd.nextInt(4)),
        group = group)
    }
    val ds = spark.createDataset(rows).repartition(4)
    val bcastPrev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val collector = new graft.tools.PlanSig.Collector
    spark.listenerManager.register(collector)
    try {
      collector.reset()
      val smjResult = TreeStatsIterative.computeSortMerge(ds)
      val fp = collector.takeFingerprint()
      assert(fp.hist.getOrElse("smj", 0L) >= 1L,
        s"the forced arm must execute at least one SortMergeJoin: ${fp.hist}")
      assert(fp.hist.getOrElse("bhj", 0L) == 0L,
        s"no broadcast join may survive the pinned thresholds: ${fp.hist}")
      assertSame(smjResult, TreeStats.compute(ds))
      assert(spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold") == bcastPrev,
        "broadcast threshold must be restored after the eager materialization")
    } finally spark.listenerManager.unregister(collector)
  }

  test("hybrid router: big groups take the relational path, output unchanged") {
    import spark.implicits._
    val rnd = new Random(5)
    // group sizes 10..80 with threshold 40 → both paths exercised
    val rows = (0 until 8).flatMap { g =>
      val size = 10 * (g + 1)
      (1 to size).map { i =>
        val id = g * 1000 + i
        val parent = if (i == 1) None else Some((g * 1000 + 1 + rnd.nextInt(i - 1)).toLong)
        val kind = rnd.nextInt(3)
        row(id,
          reply = if (kind != 2) parent else None,
          q = if (kind == 2) parent else None,
          author = rnd.nextInt(4),
          counts = (rnd.nextInt(3), rnd.nextInt(3), rnd.nextInt(3), rnd.nextInt(3)),
          group = g)
      }
    }
    val ds = spark.createDataset(rows)
    assertSame(TreeStatsIterative.computeHybrid(ds, threshold = 40),
      TreeStats.compute(ds))
    // threshold above every group size → pure in-memory path, same result
    assertSame(TreeStatsIterative.computeHybrid(ds, threshold = 10000),
      TreeStats.compute(ds))
  }

  test("auto router: histogram-derived threshold matches the manual routing on a mixed corpus") {
    import spark.implicits._
    val rnd = new Random(9)
    // 99 shallow groups (≤ 30 rows) + one deep outlier (300 rows): the
    // p99 bucket boundary lands between them, so auto picks the same
    // routing a hand-tuned threshold would (outlier relational, bulk
    // in-memory)
    val rows = (0 until 100).flatMap { g =>
      val size = if (g == 99) 300 else 10 + rnd.nextInt(21)
      (1 to size).map { i =>
        val id = g * 1000 + i
        val parent = if (i == 1) None else Some((g * 1000 + 1 + rnd.nextInt(i - 1)).toLong)
        row(id,
          reply = if (i % 3 != 2) parent else None,
          q = if (i % 3 == 2) parent else None,
          author = i % 5, counts = (i % 3, i % 5, i % 2, i % 4),
          group = g)
      }
    }
    val ds = spark.createDataset(rows)
    val sizes = ds.groupBy(org.apache.spark.sql.functions.col("group_id")).count()
    val auto = TreeStatsIterative.autoThresholdFrom(sizes, capRows = 2000000L)
    // bulk sizes ≤ 30 → buckets ≤ 5 (2^5 = 32); the 300-row outlier sits
    // in bucket 9 and is < 1% of groups, so the boundary is 32
    assert(auto == 32L, s"derived threshold $auto")
    // routing identity: the auto threshold splits groups exactly like a
    // manual threshold in the same gap, and the output is unchanged
    val manual = 40L
    val routeAuto = sizes.where(org.apache.spark.sql.functions.col("count") > auto)
      .select("group_id").as[Long].collect().toSet
    val routeManual = sizes.where(org.apache.spark.sql.functions.col("count") > manual)
      .select("group_id").as[Long].collect().toSet
    assert(routeAuto == routeManual && routeAuto == Set(99L))
    assertSame(TreeStatsIterative.computeAuto(ds), TreeStats.compute(ds))
    // capRows stays the hard ceiling even when the histogram asks higher
    assert(TreeStatsIterative.autoThresholdFrom(sizes, capRows = 16L) == 16L)
  }

  test("cyclic parent pointers fail loudly; the in-memory path breaks them deterministically") {
    import spark.implicits._
    // 3-cycle plus a tail hanging off it — constructible, impossible in
    // the domain. The relational path must REFUSE (truncated-path stats
    // would silently disagree); the in-memory path's deterministic
    // cycle-break keeps working.
    val rows = Seq(
      row(1, reply = Some(3)),
      row(2, reply = Some(1)),
      row(3, reply = Some(2)),
      row(4, reply = Some(1))) // tail into the cycle
    val ds = spark.createDataset(rows)
    val e = intercept[IllegalStateException] {
      TreeStatsIterative.compute(ds).toDF().count()
    }
    assert(e.getMessage.contains("cycle detected"), e.getMessage)
    assert(TreeStats.compute(ds).toDF().count() == 4L)
  }

  test("null author_id raises at the boundary instead of silently drifting") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(7L), None: Option[Long], 1L),
      (2L, None: Option[Long], Some(1L), 1L)) // null author on row 2
      .toDF("tweet_id", "author_id", "in_reply_to", "group_id")
      .select(col("tweet_id"), col("author_id").as("author_id"),
        col("in_reply_to"),
        lit(null).cast("long").as("retweet_of"), lit(null).cast("long").as("quotes"),
        lit(0L).as("reply_count"), lit(0L).as("quote_count"),
        lit(0L).as("like_count"), lit(0L).as("retweet_count"), col("group_id"))
    val e = intercept[Exception] {
      TreeStatsIterative.compute(df.as[TreeInput]).toDF().count()
    }
    assert(e.getMessage.contains("null author_id"), e.getMessage)
  }

  test("hybrid router: over-threshold id list beyond the inline cap takes the broadcast-join split") {
    import spark.implicits._
    // 3000 two-row groups with threshold 1: every group is "big", far
    // past MaxInlineIds — the router must degrade to broadcast
    // semi/anti joins and still agree with the in-memory aggregate
    assert(3000 > TreeStatsIterative.MaxInlineIds)
    val rows = (0 until 3000).flatMap { g =>
      Seq(row(g * 10L + 1, group = g, author = g % 5),
        row(g * 10L + 2, reply = Some(g * 10L + 1), group = g, author = g % 3))
    }
    val ds = spark.createDataset(rows)
    assertSame(TreeStatsIterative.computeHybrid(ds, threshold = 1),
      TreeStats.compute(ds))
  }

  test("wide shallow mega-group flows through bounded shuffled aggregates") {
    import spark.implicits._
    val n = sys.env.getOrElse("GRAFT_STRESS_N", "1000000").toInt
    // 16-ary tree: parent(id) = id/16 (0 = root marker → none); depth ~
    // log16(n); edge type deterministic so results are reproducible
    val ds = spark.range(1, n + 1).select(
      col("id").as("tweet_id"),
      (col("id") % 1000).as("author_id"),
      when(col("id") > 15 && col("id") % 3 =!= 0, expr("id DIV 16")).as("in_reply_to"),
      when(col("id") > 15 && col("id") % 3 === 0, expr("id DIV 16")).as("retweet_of"),
      lit(null).cast("long").as("quotes"),
      (col("id") % 7).as("reply_count"),
      (col("id") % 5).as("quote_count"),
      (col("id") % 11).as("like_count"),
      (col("id") % 3).as("retweet_count"),
      lit(1L).as("group_id")).as[TreeInput]
    val out = TreeStatsIterative.compute(ds)
    val agg = out.agg(
      count(lit(1)).as("rows"),
      sum(col("ur_descendants")).as("sum_ur_desc"),
      max(col("ur_max_depth")).as("deepest")).head()
    assert(agg.getLong(0) == n.toLong)
    // every non-root node (ids 16..n) is an ur-descendant of each of its
    // ancestors: sum over nodes of ur_descendants == sum over non-roots
    // of their ancestor-chain length (ids 1..15 are isolated roots)
    def chainLen(id: Long): Long = {
      var d = 0L; var x = id
      while (x >= 16) { x = x / 16; d += 1 }
      d
    }
    val expectedPairs = (16 to n).map(i => chainLen(i.toLong)).sum
    assert(agg.getLong(1) == expectedPairs)
    // depth is monotone in id, so the deepest node is the largest id
    assert(agg.getLong(2) == chainLen(n.toLong))
  }
}
