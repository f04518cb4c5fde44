package graft.graph

import scala.util.Random

import graft.SparkSuite

class ClosureSpec extends SparkSuite {
  import spark.implicits._

  private def resolve(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Closure.resolveRoots(edges.toDF("id", "parent"))
      .as[(Long, Long)].collect().toMap

  test("chain collapses to its root") {
    val roots = resolve(Seq(2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    assert(roots == Map(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("forest of two trees") {
    val roots = resolve(Seq(2L -> 1L, 3L -> 1L, 20L -> 10L, 30L -> 20L))
    assert(roots == Map(2L -> 1L, 3L -> 1L, 20L -> 10L, 30L -> 10L))
  }

  test("two-node cycle terminates within maxIter") {
    val out = Closure.resolveRoots(Seq(1L -> 2L, 2L -> 1L).toDF("id", "parent"), maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 2L)) // deterministic, no hang
  }

  test("property: random forests match naive root-walk") {
    val rnd = new Random(1)
    for (_ <- 1 to 20) {
      val n = 2 + rnd.nextInt(200)
      val edges = (2 to n).flatMap { id =>
        if (rnd.nextDouble() < 0.8) Some(id.toLong -> (1 + rnd.nextInt(id - 1)).toLong)
        else None
      }
      val parent = edges.toMap
      def rootOf(x: Long): Long =
        parent.get(x).map(rootOf).getOrElse(x)
      val want = edges.map { case (id, _) => id -> rootOf(id) }.toMap
      assert(resolve(edges) == want)
      val frontier = Closure.resolveRootsFrontier(edges.toDF("id", "parent"))
        .as[(Long, Long)].collect().toMap
      assert(frontier == want)
    }
  }

  test("frontier variant: cycle terminates within maxIter") {
    val out = Closure
      .resolveRootsFrontier(Seq(1L -> 2L, 2L -> 1L).toDF("id", "parent"), maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 2L))
  }

  test("enrich coalesces missing ids to their own value") {
    val facts = Seq((10L, "a"), (2L, "b")).toDF("conversation_id", "x")
    val out = Closure.enrich(facts, Seq(2L -> 1L).toDF("id", "parent"), "conversation_id")
      .select("conversation_id", "ur_conversation_id")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 10L, 2L -> 1L))
  }

  test("addEdges: incremental == full recompute on an append-only split") {
    // multi-root forest (roots 4..7) + a deep batch-internal chain:
    // parents are always < children, so an id-threshold split is
    // append-consistent (batch children never parent settled children)
    val tree = (8 to 300).map(i => (i.toLong, (i / 2).toLong))
    val chain = (301 to 320).map(i => (i.toLong, (i - 1).toLong))
    val all = tree ++ chain
    val old = all.filter(_._1 <= 200)
    val batch = all.filter(_._1 > 200)
    val full = Closure.resolveRoots(all.toDF("id", "parent"))
      .as[(Long, Long)].collect().toMap
    val inc = Closure.addEdges(
        Closure.resolveRoots(old.toDF("id", "parent")),
        batch.toDF("id", "parent"))
      .as[(Long, Long)].collect().toMap
    assert(inc == full)
    // sanity: the forest really is multi-root and the chain resolves
    // THROUGH the settled graph
    assert(full.values.toSet == Set(4L, 5L, 6L, 7L))
    assert(full(320L) == full(300L))
    // delta law: the append relation is exactly the full result minus
    // the settled keys (disjoint key sets under the append contract)
    val settled = Closure.resolveRoots(old.toDF("id", "parent"))
    val settledMap = settled.as[(Long, Long)].collect().toMap
    val delta = Closure.addEdgesDelta(settled, batch.toDF("id", "parent"))
      .as[(Long, Long)].collect().toMap
    assert(delta.keySet.intersect(settledMap.keySet).isEmpty)
    assert(settledMap ++ delta == full)
  }

  test("addEdges guard: a batch edge re-parenting a settled id raises loudly") {
    val settled = Closure.resolveRoots(Seq(2L -> 1L, 3L -> 2L).toDF("id", "parent"))
    val batch = Seq(3L -> 9L).toDF("id", "parent") // 3 is already settled
    val e = intercept[Exception] {
      Closure.addEdges(settled, batch).collect()
    }
    assert(e.getMessage.contains("append-only contract"), e.getMessage)
  }

  test("addEdges guard: a batch edge re-parenting an OLD ROOT raises loudly") {
    // 1 never appears as a settled id (it has no parent row) but it IS
    // the old forest's root — re-parenting it would silently strand 2
    // and 3 on the stale root, so the guard's root-column half fires
    val settled = Closure.resolveRoots(Seq(2L -> 1L, 3L -> 2L).toDF("id", "parent"))
    val batch = Seq(1L -> 9L).toDF("id", "parent")
    val e = intercept[Exception] {
      Closure.addEdges(settled, batch).collect()
    }
    assert(e.getMessage.contains("old root"), e.getMessage)
  }

  test("addEdges property: ANY depth-ordered prefix split matches full recompute") {
    // Exactly what the append-only contract guarantees (and no more):
    // children arrive after their parents. Depth-ordering the edges and
    // cutting at ANY point produces a contract-respecting split — the
    // incremental result must be hash-equal to the full recompute, and
    // the guard must stay silent.
    val rnd = new Random(7)
    for (_ <- 1 to 8) {
      val n = 20 + rnd.nextInt(150)
      val edges = (2 to n).flatMap { id =>
        if (rnd.nextDouble() < 0.85) Some(id.toLong -> (1 + rnd.nextInt(id - 1)).toLong)
        else None
      }
      val parent = edges.toMap
      def depth(x: Long): Int = parent.get(x).map(depth(_) + 1).getOrElse(0)
      val ordered = edges.sortBy { case (id, _) => (depth(id), id) }
      val cut = 1 + rnd.nextInt(ordered.size - 1)
      val (old, batch) = ordered.splitAt(cut)
      val full = Closure.resolveRoots(edges.toDF("id", "parent"))
        .as[(Long, Long)].collect().toMap
      val inc = Closure.addEdges(
          Closure.resolveRoots(old.toDF("id", "parent")),
          batch.toDF("id", "parent"))
        .as[(Long, Long)].collect().toMap
      assert(inc == full, s"cut=$cut n=$n")
    }
  }

  test("addEdges: the settled relation is probed, not re-resolved") {
    val dir = java.nio.file.Files.createTempDirectory("settled").toString + "/roots"
    val old = (8 to 200).map(i => (i.toLong, (i / 2).toLong))
    Closure.resolveRoots(old.toDF("id", "parent")).write.parquet(dir)
    val settled = spark.read.parquet(dir)
    val batch = (201 to 240).map(i => (i.toLong, (i / 2).toLong))
    val out = Closure.addEdges(settled, batch.toDF("id", "parent"))
    // the batch resolved internally during construction (eager loop on
    // batch-sized relations only); the FINAL plan reads the settled
    // parquet exactly twice — union pass-through + the one probe join —
    // and contains no iterative machinery over it
    val plan = out.queryExecution.executedPlan.toString
    val settledScans = "roots".r.findAllIn(plan).size
    assert(settledScans == 2, s"expected 2 settled scans, got $settledScans:\n$plan")
    // and the result is still exact
    val full = Closure.resolveRoots((old ++ batch).toDF("id", "parent"))
      .as[(Long, Long)].collect().toMap
    assert(out.as[(Long, Long)].collect().toMap == full)
  }
}
