package graft.tools
import org.apache.spark.sql.SparkSession
object GenGolden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = graft.pipeline.ConvoyPipeline.run(spark,
      Seq("/root/repo/src/test/resources/pages_original.jsonl"),
      Seq("/root/repo/src/test/resources/pages_expansion.jsonl"))
    val rows = out.tweetStats.orderBy("tweet_id").collect()
    val cols = out.tweetStats.columns
    val sb = new StringBuilder(cols.mkString(",") + "\n")
    rows.foreach { r =>
      sb.append((0 until r.length).map(i => String.valueOf(r.get(i))).mkString(",") + "\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/src/test/resources/golden_tweet_stats.csv"),
      sb.toString)
    println("golden written: " + rows.length + " rows")
    spark.stop()
  }
}
