package graft.ext

import graft.SparkSuite

/** Error-bound gates for the approximate-sketch surface (graft.ext.Approx):
  * DuckDB cannot hash-match HLL / quantile-summary internals, so the
  * approx twins are verified HERE against the exact operators on the
  * driver fixture — |approx − exact| must land inside the bound each
  * sketch is configured for. The registered q104 emits the exact form.
  */
class ApproxSpec extends SparkSuite {
  import spark.implicits._

  private lazy val events = graft.util.Tables.events(spark, "/root/testdata/sf0.001")

  test("approx_count_distinct stays within the configured rsd of the exact twin") {
    val exact = Approx.usersPerType(events)
      .as[(String, Long)].collect().toMap
    for (rsd <- Seq(0.05, 0.02)) {
      val approx = Approx.usersPerTypeApprox(events, rsd)
        .as[(String, Long)].collect().toMap
      assert(approx.keySet == exact.keySet)
      exact.foreach { case (t, e) =>
        val a = approx(t)
        // 3× the relative standard deviation — the standard high-
        // probability envelope for an HLL estimate
        assert(math.abs(a - e) <= math.max(3 * rsd * e, 1.0),
          s"$t: rsd=$rsd exact=$e approx=$a")
      }
    }
  }

  test("approx_percentile respects its rank-error contract vs the observed distribution") {
    import org.apache.spark.sql.functions.{col, round}
    val byType = events
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(col("event_type"), col("cents")).as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    for (accuracy <- Seq(100, 10000)) {
      val approx = Approx.centsPercentilesPerTypeApprox(events, accuracy)
        .as[(String, Long, Long)].collect()
      assert(approx.map(_._1).toSet == byType.keySet)
      approx.foreach { case (t, p50, p99) =>
        val vs = byType(t)
        val n = vs.size
        // the GK contract: the returned OBSERVED value's rank is within
        // n/accuracy of the target rank (±1 row of slack for the
        // floor/ceil conventions at the boundary)
        def rankOk(v: Long, p: Double): Boolean = {
          val eps = n.toDouble / accuracy + 1
          vs.count(_ < v) <= p * n + eps && vs.count(_ <= v) >= p * n - eps
        }
        assert(rankOk(p50, 0.5), s"$t p50=$p50 accuracy=$accuracy n=$n")
        assert(rankOk(p99, 0.99), s"$t p99=$p99 accuracy=$accuracy n=$n")
      }
    }
  }
}
