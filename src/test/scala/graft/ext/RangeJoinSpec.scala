package graft.ext

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Range-join semantics: inclusive containment on both boundaries,
  * exactly-once pair emission across bucket widths, randomized
  * cross-check against a naive quadratic scan. */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def pts(rows: Seq[(Long, String, Long)]): DataFrame =
    rows.toDF("pid", "k", "tsec")
      .select(col("pid"), col("k"), timestamp_seconds(col("tsec")).as("pt"))

  private def ivs(rows: Seq[(Long, String, Long, Long)]): DataFrame =
    rows.toDF("iid", "k", "ssec", "esec")
      .select(col("iid"), col("k"),
        timestamp_seconds(col("ssec")).as("s"),
        timestamp_seconds(col("esec")).as("e"))

  private def run(p: DataFrame, i: DataFrame, width: Long): Set[(Long, Long)] =
    RangeJoin.pointInInterval(p, i, Seq("k"), "pt", "s", "e", width)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("boundaries are inclusive on both ends; outside points drop") {
    val p = pts(Seq((1L, "a", 100L), (2L, "a", 200L), (3L, "a", 150L),
      (4L, "a", 99L), (5L, "a", 201L), (6L, "b", 150L)))
    val i = ivs(Seq((10L, "a", 100L, 200L)))
    assert(run(p, i, 60L) == Set((1L, 10L), (2L, 10L), (3L, 10L)))
  }

  test("a pair meets exactly once even when the interval spans many buckets") {
    val p = pts(Seq((1L, "a", 500L)))
    val i = ivs(Seq((10L, "a", 0L, 10000L)))
    val out = RangeJoin.pointInInterval(pts(Seq((1L, "a", 500L))), i,
      Seq("k"), "pt", "s", "e", 7L) // interval replicates to ~1430 buckets
    assert(out.count() == 1L)
    val _ = p
  }

  test("randomized cross-check vs a naive quadratic scan, several widths") {
    val rnd = new Random(47)
    val prows = (1 to 300).map(n =>
      (n.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(5000).toLong))
    val irows = (1 to 80).map { n =>
      val s = rnd.nextInt(5000).toLong
      (n.toLong, s"k${rnd.nextInt(4)}", s, s + rnd.nextInt(400).toLong)
    }
    val want = (for {
      (pid, pk, t) <- prows
      (iid, ik, s, e) <- irows
      if pk == ik && t >= s && t <= e
    } yield (pid, iid)).toSet
    for (width <- Seq(1L, 50L, 300L, 1000L))
      assert(run(pts(prows), ivs(irows), width) == want, s"width=$width")
  }

  test("empty sides yield empty results, no crash") {
    val p = pts(Seq((1L, "a", 100L)))
    val i = ivs(Seq((1L, "a", 0L, 200L)))
    val emptyP = pts(Seq.empty)
    val emptyI = ivs(Seq.empty)
    assert(RangeJoin.pointInInterval(emptyP, i, Seq("k"), "pt", "s", "e", 60L).count() == 0)
    assert(RangeJoin.pointInInterval(p, emptyI, Seq("k"), "pt", "s", "e", 60L).count() == 0)
  }

  test("colliding interval column names are rejected loudly") {
    val p = pts(Seq((1L, "a", 1L)))
    val bad = ivs(Seq((1L, "a", 0L, 2L))).withColumnRenamed("iid", "pid")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, bad, Seq("k"), "pt", "s", "e", 10L)
    }
    assert(e.getMessage.contains("rename"))
  }
}
