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
}
