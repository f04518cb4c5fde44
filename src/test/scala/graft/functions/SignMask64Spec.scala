package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SignMask64 vs the spelled-out per-plane `long_dot(q, plane) >= 0`
  * composition it replaced, plus interpreted/codegen parity.
  */
class SignMask64Spec extends SparkSuite {
  import spark.implicits._

  private val rnd = new Random(42)
  private val dim = 16
  private val planes = Array.fill(24)(Array.fill(dim)(if (rnd.nextBoolean()) 1L else -1L))
  private val vecs = Seq.fill(50)(Seq.fill(dim)(rnd.nextInt(2001) - 1000L))

  private def df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "q")

  test("mask bits equal the per-plane long_dot composition") {
    graft.functions.LongDot.register(spark)
    val spelled = df.select(col("id") +: planes.zipWithIndex.map { case (p, i) =>
      (call_function("long_dot", col("q"), typedLit(p.toSeq)) >= 0).as(s"b$i")
    }.toSeq: _*).collect().map(r =>
      r.getLong(0) -> (0 until planes.length).map(i => r.getBoolean(i + 1))).toMap
    val masked = df.select(col("id"),
      SignMask64.signMask(spark, "spec", planes)(col("q")).as("m"))
      .collect().map(r => r.getLong(0) ->
        (0 until planes.length).map(i => ((r.getLong(1) >> i) & 1L) == 1L)).toMap
    assert(masked == spelled)
  }

  test("a dim mismatch fails loudly instead of silently truncating the dot product") {
    val shortVecs = Seq((0L, Seq.fill(dim - 2)(1L))).toDF("id", "q")
    val e = intercept[Exception] {
      shortVecs.select(SignMask64.signMask(spark, "spec", planes)(col("q"))).collect()
    }
    assert(e.getMessage.contains("dim") || e.getCause != null &&
      e.getCause.getMessage.contains("dim"), s"expected a dim-mismatch error, got: $e")
  }

  test("interpreted eval matches codegen eval") {
    def run() = df.select(SignMask64.signMask(spark, "spec", planes)(col("q")))
      .collect().map(_.getLong(0)).toSeq
    val key = "spark.sql.codegen.wholeStage"
    val before = spark.conf.get(key)
    try {
      spark.conf.set(key, "false"); val off = run()
      spark.conf.set(key, "true"); val on = run()
      assert(off == on)
    } finally spark.conf.set(key, before)
  }
}
