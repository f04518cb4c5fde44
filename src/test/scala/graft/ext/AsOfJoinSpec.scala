package graft.ext

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** As-of join semantics: inclusive backward/forward matches, pre-marker
  * nulls, tolerance, key isolation — plus a randomized cross-check
  * against a naive per-row scan. */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private lazy val left = Seq(
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
    (4L, "b", 15L), (5L, "b", 5L)
  ).toDF("id", "k", "t")

  private lazy val right = Seq(
    ("a", 10L, "m10"), ("a", 25L, "m25"),
    ("b", 10L, "m10b")
  ).toDF("k", "rt", "v")

  test("backward: greatest right ts <= left ts, inclusive; null before first marker") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt")
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("m10"))  // t=10 matches rt=10 inclusively
    assert(out(2L).contains("m10"))  // 25 is in the future
    assert(out(3L).contains("m25"))
    assert(out(4L).contains("m10b"))
    assert(out(5L).isEmpty)          // before any marker for key b
  }

  test("forward: smallest right ts >= left ts, inclusive") {
    val out = AsOfJoin.forward(left, right, Seq("k"), "t", "rt")
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("m10"))
    assert(out(2L).contains("m25"))
    assert(out(3L).isEmpty)          // nothing at or after 30
    assert(out(4L).isEmpty)
    assert(out(5L).contains("m10b"))
  }

  test("tolerance nulls out stale matches but keeps fresh ones") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
      tolerance = Some(lit(5L)))
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("m10"))  // staleness 0
    assert(out(2L).isEmpty)          // staleness 10 > 5
    assert(out(3L).contains("m25"))  // staleness 5 == tolerance (inclusive)
  }

  test("randomized cross-check against a naive scan (both directions)") {
    val rnd = new Random(31)
    val lrows = (1 to 400).map(i => (i.toLong, s"k${rnd.nextInt(6)}", rnd.nextInt(1000).toLong))
    // unique (key, ts) on the right — the operator's documented precondition
    val rrows = rnd.shuffle((0 until 6).flatMap(k =>
      rnd.shuffle((0 until 1000).toVector).take(40).map(t => (s"k$k", t.toLong, s"v$k-$t"))))
    val l = lrows.toDF("id", "k", "t")
    val r = rrows.toDF("k", "rt", "v")
    def naive(forward: Boolean): Map[Long, Option[String]] = lrows.map { case (id, k, t) =>
      val cands =
        if (forward) rrows.filter(x => x._1 == k && x._2 >= t)
        else rrows.filter(x => x._1 == k && x._2 <= t)
      val best =
        if (cands.isEmpty) None
        else Some(if (forward) cands.minBy(_._2)._3 else cands.maxBy(_._2)._3)
      id -> best
    }.toMap
    val gotB = AsOfJoin.backward(l, r, Seq("k"), "t", "rt")
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    val gotF = AsOfJoin.forward(l, r, Seq("k"), "t", "rt")
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(gotB == naive(forward = false))
    assert(gotF == naive(forward = true))
  }

  test("colliding right column names are rejected loudly") {
    val bad = right.withColumnRenamed("v", "t") // collides with left ts
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, bad, Seq("k"), "t", "rt")
    }
    assert(e.getMessage.contains("rename"))
  }
}
