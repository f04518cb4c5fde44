package graft.tools

import graft.SparkSuite

/** Sanity of the SparkListener execution telemetry on three known plan
  * shapes — shuffle-free scan, shuffling aggregate, broadcast join.
  * (Telemetry has no oracle; presence + plan-consistent signs are the
  * verifiable contract. Collects avoid `count()` where zero-shuffle is
  * asserted — even a global count adds a SinglePartition exchange.)
  */
class ExecStatsSpec extends SparkSuite {
  import spark.implicits._

  test("shuffle-free filter+collect reports zero shuffle bytes and real tasks") {
    val (rows, m) = ExecStats.measure(spark) {
      spark.range(0, 100000L).where("id % 10000 = 7").collect().length
    }
    assert(rows == 10)
    assert(m.tasks > 0 && m.jobs >= 1)
    assert(m.shuffleReadBytes == 0L && m.shuffleWriteBytes == 0L,
      s"filter+collect should not shuffle: $m")
  }

  test("groupBy aggregate reports shuffle write and read") {
    val (n, m) = ExecStats.measure(spark) {
      spark.range(0, 200000L).selectExpr("id % 1000 as k", "id as v")
        .groupBy("k").sum("v").collect().length
    }
    assert(n == 1000)
    assert(m.shuffleWriteBytes > 0L, s"groupBy must shuffle-write: $m")
    assert(m.shuffleReadBytes > 0L, s"groupBy must shuffle-read: $m")
  }

  test("broadcast join reports zero shuffle; metrics reset per measured body") {
    val dim = Seq((0L, "a"), (1L, "b")).toDF("k", "tag")
    val (n, m) = ExecStats.measure(spark) {
      spark.range(0, 100L).selectExpr("id % 2 as k")
        .join(org.apache.spark.sql.functions.broadcast(dim), "k")
        .collect().length
    }
    assert(n == 100)
    assert(m.tasks > 0)
    assert(m.shuffleReadBytes == 0L && m.shuffleWriteBytes == 0L,
      s"broadcast join must not shuffle: $m")
    // a second measurement starts from zero (no cross-call bleed)
    val (k, m2) = ExecStats.measure(spark) {
      spark.range(10L).collect().length
    }
    assert(k == 10)
    assert(m2.shuffleWriteBytes == 0L && m2.tasks > 0L)
  }
}
