package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall seconds.
  * Queries run in name order after a session warm-up (first actions in a
  * fresh JVM otherwise pay 10-20 s of classloading/codegen that would be
  * misattributed to whichever query runs first).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // driver contract: local[32] with shuffle.partitions=32 (not 200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: touch every table and exercise codegen/shuffle machinery
    for (t <- Seq("lineitem", "orders", "customer", "documents", "embeddings"))
      graft.util.Tables.table(spark, sfDir, t).count()
    graft.util.Tables.events(spark, sfDir).groupBy("event_type").count().count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try {
        val df = fn(spark, sfDir)
        // force FULL evaluation of every output column: a row-hash
        // aggregate Catalyst cannot prune (a bare count() would let
        // projection-only queries time just the scan, not the
        // expression work); bit_xor cannot overflow under ANSI mode.
        // SPARK_GRAFT_BENCH_LEGACY=1 restores the count() harness for
        // like-for-like comparison against pre-r2 numbers.
        if (sys.env.get("SPARK_GRAFT_BENCH_LEGACY").contains("1")) df.count()
        else df.select(org.apache.spark.sql.functions.xxhash64(
            df.columns.toIndexedSeq.map(df.col): _*).as("_row_hash"))
          .agg(org.apache.spark.sql.functions.expr("bit_xor(_row_hash)")).head()
        true
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
