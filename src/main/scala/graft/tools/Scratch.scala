package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    graft.util.Tables.events(spark, sfDir).count()
    graft.util.Tables.lineitem(spark, sfDir).count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val qs = graft.SparkEntry.queries
    for (name <- args.drop(1)) {
      time(name + " (cold)")(qs(name)(spark, sfDir).count())
      time(name + " (warm)")(qs(name)(spark, sfDir).count())
    }
    spark.stop()
  }
}
