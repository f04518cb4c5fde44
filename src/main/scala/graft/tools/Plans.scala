package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for selected queries — the evidence
  * behind PLANS.md. Usage: runMain graft.tools.Plans <sfDir> <query...>
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    val names = if (args.length > 1) args.drop(1).toSeq else qs.keys.toSeq.sorted
    for (name <- names) {
      println(s"==================== $name ====================")
      qs(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
