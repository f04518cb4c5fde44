package graft.stats

import scala.util.Random

import graft.SparkSuite

/** Unit + property tests for the tree-statistics operator: hand-built
  * shapes covering every reference branch, then randomized forests
  * (with quote/retweet cross-links and missing parents) compared against
  * the independent NaiveTreeStats implementation.
  */
class TreeStatsSpec extends SparkSuite {

  private def row(id: Long, reply: Option[Long] = None, rt: Option[Long] = None,
                  q: Option[Long] = None, author: Long = 0, counts: (Long, Long, Long, Long) = (0, 0, 0, 0),
                  group: Long = 1): TreeInput =
    TreeInput(id, author, reply, rt, q, counts._1, counts._2, counts._3, counts._4, group)

  private def run(rows: Seq[TreeInput]): Map[Long, TreeStatsRow] =
    TreeStats.processGroup(rows.iterator).map(r => r.tweet_id -> r).toMap

  private def assertMatches(rows: Seq[TreeInput]): Unit = {
    val got = run(rows)
    val want = NaiveTreeStats.compute(rows)
    assert(got.keySet == want.keySet)
    for (id <- got.keySet) {
      val (g, w) = (got(id), want(id))
      assert(g == w || {
        // identical modulo float noise
        g.productIterator.zip(w.productIterator).forall {
          case (a: Double, b: Double) => math.abs(a - b) <= 1e-9 * math.max(1, math.abs(b))
          case (a, b) => a == b
        }
      }, s"mismatch for $id:\n got=$g\nwant=$w")
    }
  }

  test("singleton tree has constant stats") {
    val out = run(Seq(row(1, author = 7, counts = (2, 3, 4, 5))))
    val s = out(1)
    assert(s.descendants == 0 && s.ur_descendants == 0)
    assert(s.t_authors == 1 && s.ur_t_authors == 1)
    assert(s.t_reply_count == 2 && s.mean_reply_count == 2.0)
    assert(s.branching_factor == 0.0 && s.mean_depth == 0.0)
    assert(s.reply_count_mad == 0.0)
  }

  test("reply chain of depth 4: memoized-path sum_depth counts leaf depth minus one") {
    // 1 <- 2 <- 3 <- 4 <- 5 (replies)
    val rows = (2 to 5).map(i => row(i, reply = Some(i - 1))) :+ row(1)
    val out = run(rows)
    assert(out(1).descendants == 4)
    assert(out(1).max_depth == 4)
    assert(out(1).leaf_descendants == 1)
    // leaf at depth 4 contributes (4-1): de-facto reference semantics
    assert(out(1).mean_depth == 3.0)
    assert(out(2).mean_depth == 2.0)
    assert(out(4).mean_depth == 0.0)
    assertMatches(rows)
  }

  test("star: root with 5 reply leaves") {
    val rows = row(1, author = 1) +: (2 to 6).map(i => row(i, reply = Some(1), author = i))
    val out = run(rows)
    assert(out(1).descendants == 5 && out(1).leaf_descendants == 5)
    assert(out(1).max_depth == 1 && out(1).mean_depth == 0.0)
    assert(out(1).t_authors == 6)
    assert(out(1).branching_factor == 5.0)
    assertMatches(rows)
  }

  test("quote and retweet edges only affect ur_ variants") {
    // 1 <-reply- 2 ; 1 <-quote- 3 ; 3 <-retweet- 4
    val rows = Seq(row(1), row(2, reply = Some(1)),
      row(3, q = Some(1)), row(4, rt = Some(3)))
    val out = run(rows)
    assert(out(1).descendants == 1 && out(1).ur_descendants == 3)
    assert(out(1).children == 1 && out(1).ur_children == 2)
    assert(out(1).max_depth == 1 && out(1).ur_max_depth == 2)
    assertMatches(rows)
  }

  test("reply-that-also-quotes attaches via the reply edge") {
    val rows = Seq(row(1), row(2, reply = Some(1), q = Some(99)))
    val out = run(rows)
    assert(out(1).descendants == 1) // quote ignored: reply precedence
    assertMatches(rows)
  }

  test("missing parent becomes placeholder: children still computed, placeholder not emitted") {
    val rows = Seq(row(10, reply = Some(999)), row(11, reply = Some(10)))
    val out = run(rows)
    assert(out.keySet == Set(10L, 11L))
    assert(out(10).descendants == 1)
  }

  test("two-node quote cycle terminates deterministically") {
    val rows = Seq(row(1, q = Some(2)), row(2, q = Some(1)))
    val out = run(rows) // must not hang; cycle edge contributes nothing
    assert(out.keySet == Set(1L, 2L))
  }

  test("property: random forests with cross-links match the naive implementation") {
    val rnd = new Random(42)
    for (trial <- 1 to 50) {
      val n = 1 + rnd.nextInt(60)
      val ids = (1 to n).map(_.toLong)
      val rows = ids.map { id =>
        val parentPool = ids.filter(_ < id) // children newer than parents
        val parent = if (parentPool.nonEmpty && rnd.nextDouble() < 0.85)
          Some(parentPool(rnd.nextInt(parentPool.size)))
        else if (rnd.nextDouble() < 0.05) Some(100000L + rnd.nextInt(5)) // missing parent
        else None
        val kind = rnd.nextInt(3)
        row(id,
          reply = if (kind == 0) parent else None,
          rt = if (kind == 1) parent else None,
          q = if (kind == 2) parent else None,
          author = rnd.nextInt(8),
          counts = (rnd.nextInt(5), rnd.nextInt(5), rnd.nextInt(5), rnd.nextInt(5)))
      }
      assertMatches(rows)
    }
  }

  test("distributed compute over groups equals per-group processGroup") {
    import spark.implicits._
    val rnd = new Random(7)
    val rows = (1 to 200).map { i =>
      val group = i % 10
      val pool = (1 to i - 1).filter(j => j % 10 == group)
      val parent = if (pool.nonEmpty) Some(pool(rnd.nextInt(pool.size)).toLong) else None
      row(i, reply = parent, author = i % 5,
        counts = (i % 3, i % 4, i % 5, i % 2), group = group)
    }
    val dist = TreeStats.compute(spark.createDataset(rows))
      .collect().map(r => r.tweet_id -> r).toMap
    val local = rows.groupBy(_.group_id).values.flatMap(g =>
      TreeStats.processGroup(g.iterator)).map(r => r.tweet_id -> r).toMap
    assert(dist == local)
  }

  test("aggregate path (TypedImperativeAggregate) equals the flatMapGroups path bit-for-bit") {
    import spark.implicits._
    val rnd = new Random(11)
    // cross-link-heavy forests across 16 groups, incl. missing parents
    val rows = (1 to 400).map { i =>
      val group = i % 16
      val pool = (1 until i).filter(j => j % 16 == group)
      val parent =
        if (pool.nonEmpty && rnd.nextDouble() < 0.8)
          Some(pool(rnd.nextInt(pool.size)).toLong)
        else if (rnd.nextDouble() < 0.1) Some(900000L + rnd.nextInt(3))
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
    val viaAgg = TreeStats.compute(ds).collect().map(r => r.tweet_id -> r).toMap
    val viaFmg = TreeStats.computeViaFlatMapGroups(ds)
      .collect().map(r => r.tweet_id -> r).toMap
    // == on case classes: Double fields must be BIT-identical — the agg
    // path must not perturb MAD summation order
    assert(viaAgg == viaFmg)
  }
}
