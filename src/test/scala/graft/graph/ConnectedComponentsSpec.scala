package graft.graph

import scala.util.Random

import graft.SparkSuite

class ConnectedComponentsSpec extends SparkSuite {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  /** independent union-find for expected values */
  private def naive(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("two components with a long path resolve to their minima") {
    val edges = Seq(5L -> 4L, 4L -> 3L, 3L -> 2L, 2L -> 1L, 10L -> 11L)
    assert(cc(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("property: random graphs match union-find") {
    val rnd = new Random(3)
    for (_ <- 1 to 10) {
      val n = 5 + rnd.nextInt(80)
      val edges = (1 to n).map(_ =>
        (1L + rnd.nextInt(30), 1L + rnd.nextInt(30))).filter(e => e._1 != e._2)
      if (edges.nonEmpty) assert(cc(edges) == naive(edges))
    }
  }

  private def ccAdd(old: Seq[(Long, Long)], nu: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.addEdges(
      ConnectedComponents.run(old.toDF("a", "b")), nu.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("addEdges: bridges old components, admits new nodes, leaves untouched components alone") {
    val old = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L, 20L -> 21L, 21L -> 22L,
      30L -> 31L, 50L -> 51L)
    // one batch: bridge {1,2,3}–{10,11}, bridge {20..22}–{30,31} via a
    // brand-new node 40, and a fully-new component {60,61}
    val nu = Seq(3L -> 10L, 22L -> 40L, 40L -> 30L, 60L -> 61L)
    assert(ccAdd(old, nu) == cc(old ++ nu))
    // the untouched {50,51} kept its label
    assert(ccAdd(old, nu)(51L) == 50L)
  }

  test("addEdgesDelta: applying the upsert over the old labels reproduces the full recompute") {
    val old = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L, 20L -> 21L, 21L -> 22L,
      30L -> 31L, 50L -> 51L)
    val nu = Seq(3L -> 10L, 22L -> 40L, 40L -> 30L, 60L -> 61L)
    val oldLabels = ConnectedComponents.run(old.toDF("a", "b"))
    val oldMap = oldLabels.as[(Long, Long)].collect().toMap
    val delta = ConnectedComponents.addEdgesDelta(oldLabels, nu.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    // key-wise upsert of the delta over the settled store == full CC
    assert(oldMap ++ delta == cc(old ++ nu))
    // the untouched component {50,51} is NOT in the upsert (batch-sized
    // delta — a production store never rewrites settled rows)
    assert(!delta.contains(50L) && !delta.contains(51L))
  }

  test("addEdges property: ANY old/new split of a random graph matches the full recompute") {
    // unlike forest closure, incremental CC needs no append contract —
    // contraction handles arbitrary bridging, so any split is exact
    val rnd = new Random(17)
    for (_ <- 1 to 6) {
      val n = 10 + rnd.nextInt(60)
      val edges = (1 to n).map(_ =>
        (1L + rnd.nextInt(25), 1L + rnd.nextInt(25))).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val (old, nu) = edges.partition(_ => rnd.nextBoolean())
        if (old.nonEmpty && nu.nonEmpty)
          assert(ccAdd(old, nu) == cc(edges), s"split old=$old new=$nu")
      }
    }
  }
}
