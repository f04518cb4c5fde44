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

  /** The redistributed-sink recurrence, evaluated naively on the driver. */
  private def naiveDangling(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> Scale).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) * 17L / (20L * outdeg(u)) }.sum).toMap
      val dm = nodes.filterNot(outdeg.contains).map(r).sum
      val share = dm * 17L / (20L * nodes.size)
      r = nodes.map(n => n -> (Base + in.getOrElse(n, 0L) + share)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  private def runDangling(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), iters, redistributeDangling = true)
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
    assert(PageRank.run(empty, 3, redistributeDangling = true).count() == 0L)
  }

  test("dangling redistribution, 2-chain hand check: a→b") {
    // b is a sink holding mass scale; every node gets its share back
    val edges = Seq((1L, 2L))
    val r1 = runDangling(edges, 1)
    val share = Scale * 17L / (20L * 2L)
    assert(r1(1L) == Base + share)
    assert(r1(2L) == Base + Scale * 17 / 20 + share)
  }

  test("dangling redistribution matches the naive recurrence on sink-heavy random graphs") {
    val rnd = new Random(59)
    // ids 60-79 never appear as src: guaranteed non-leaf-reachable sinks
    val edges = (1 to 400).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    for (iters <- Seq(0, 1, 3))
      assert(runDangling(edges, iters) == naiveDangling(edges, iters), s"iters=$iters")
  }

  test("redistribution changes sink-graph ranks vs the drop-mass default") {
    val rnd = new Random(60)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    assert(runDangling(edges, 3) != run(edges, 3))
  }

  test("per-iteration plan reuses the static layout: the big sides never re-shuffle or re-sort") {
    val edges = (1 to 400).map(i => ((i % 50).toLong, (i % 97 + 50).toLong))
    val plan = PageRank.runRaw(edges.toDF("src", "dst"), iters = 2)
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

  test("redistributed variant keeps one hash exchange per round: sink mass rides a one-row broadcast") {
    val edges = (1 to 400).map(i => ((i % 50).toLong, (i % 97 + 50).toLong))
    val plan = PageRank.runRaw(edges.toDF("src", "dst"), iters = 2,
        redistributeDangling = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(src"), plan)
    assert(!plan.contains("Exchange hashpartitioning(id"), plan)
    // in-mass aggregate on dst is still the ONLY hash exchange; the
    // sink-mass aggregate reduces to SinglePartition and broadcasts
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }
}
