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
}
