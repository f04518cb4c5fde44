package graft

import graft.SparkSuite

/** The SQL surface: every injected function callable from spark.sql. */
class GraftExtensionsSpec extends SparkSuite {

  test("registerAll exposes the codegen expressions to SQL text") {
    GraftExtensions.registerAll(spark)
    val row = spark.sql(
      """SELECT long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
        |       md5_prefix64('abc') AS h,
        |       rolling_fp('abcdefgh').fp_min AS fp,
        |       byte_dot(array(1Y, 2Y), array(3Y, 4Y)) AS bd""".stripMargin).head()
    assert(row.getLong(0) == 32L)
    assert(row.getLong(3) == 1 * 3 + 2 * 4)
    // first 15 hex chars of md5('abc') = 900150983cd24fb as a 60-bit int
    assert(row.getLong(1) == java.lang.Long.parseLong("900150983cd24fb", 16))
    assert(row.getLong(2) > 0L)
  }

  test("wrong arity fails analysis with a readable error, not an index error") {
    GraftExtensions.registerAll(spark)
    for (bad <- Seq("SELECT long_dot(array(1L))",
                    "SELECT md5_prefix64('a', 'b')",
                    "SELECT rolling_fp()",
                    "SELECT byte_dot(array(1Y))")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(bad).head())
      assert(e.getMessage.contains("requires"), s"unexpected message for `$bad`: ${e.getMessage}")
    }
  }

  test("the extensions class injects the same function set (builder smoke)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)   // must not throw; builders are shared
    assert(GraftExtensions.descriptions.map(_._1.funcName).sorted ==
      Seq("byte_dot", "dot_segment_fold", "graft_nfc", "graft_pct_decode",
          "idn_host_ascii", "long_dot", "md5_prefix64", "rolling_fp",
          "simple_lower"))
  }
}
