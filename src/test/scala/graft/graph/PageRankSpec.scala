package graft.graph

import scala.util.Random

import graft.SparkSuite

/** Exact-integer PageRank: hand-computed chain values, a randomized
  * cross-check against a naive in-memory evaluation of the identical
  * recurrence, and the iters=0 identity. */
class PageRankSpec extends SparkSuite {
  import spark.implicits._

  private val Scale = 1000000L
  private val Base = Scale * 3 / 20 // (1 - 17/20) * scale

  /** The same recurrence, evaluated naively on the driver. */
  private def naive(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> Scale).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) * 17L / (20L * outdeg(u)) }.sum).toMap
      r = nodes.map(n => n -> (Base + in.getOrElse(n, 0L))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("3-chain hand check: a→b→c") {
    val edges = Seq((1L, 2L), (2L, 3L))
    val r1 = run(edges, 1)
    assert(r1(1L) == Base)                          // no in-edges
    assert(r1(2L) == Base + Scale * 17 / 20)        // full damped mass from a
    assert(r1(3L) == Base + Scale * 17 / 20)
    val r2 = run(edges, 2)
    assert(r2(2L) == Base + Base * 17 / 20)         // a's rank dropped to base
    assert(r2(3L) == Base + (Base + Scale * 17 / 20) * 17 / 20)
  }

  test("fan-out splits mass by out-degree exactly") {
    // hub 1 points at 2,3,4: each gets floor(scale*17/(20*3))
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val r1 = run(edges, 1)
    val share = Scale * 17L / (20L * 3L)
    assert(Seq(2L, 3L, 4L).forall(n => r1(n) == Base + share))
  }

  test("randomized graph matches the naive recurrence bit-for-bit") {
    val rnd = new Random(53)
    val edges = (1 to 500).map(_ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    for (iters <- Seq(0, 1, 3))
      assert(run(edges, iters) == naive(edges, iters), s"iters=$iters")
  }

  test("iters=0 returns scale for every node") {
    val edges = Seq((1L, 2L), (3L, 2L))
    assert(run(edges, 0).values.toSet == Set(Scale))
  }

  test("empty edge list yields an empty result, no crash") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(PageRank.run(empty, 3).count() == 0L)
  }

  test("per-iteration plan reuses the static layout: the big sides never re-shuffle or re-sort") {
    val edges = (1 to 400).map(i => ((i % 50).toLong, (i % 97 + 50).toLong))
    val plan = PageRank.run(edges.toDF("src", "dst"), iters = 2)
      .queryExecution.executedPlan.toString
    // the static relations (edges+outdeg laid out by src, nodes by id)
    // come out of their checkpoints partitioned and sorted on the join
    // keys — no round may shuffle or sort them again; the only
    // remaining hash exchange is the contribution aggregate on dst
    assert(!plan.contains("Exchange hashpartitioning(src"), plan)
    assert(!plan.contains("Exchange hashpartitioning(id"), plan)
    assert(!plan.contains("Sort [src"), plan)
    assert(!plan.contains("Sort [id"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
