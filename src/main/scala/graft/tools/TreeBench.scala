package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.stats.{TreeInput, TreeStats}

/** Like-for-like comparison of the two TreeStats execution paths on the
  * q23 input (ad-hoc perf probe, not part of the driver contract). */
object TreeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("TB_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val input = graft.queries.GraphQueries.eventsAsTweets(spark, sfDir).select(
      col("tweet_id"), col("author_id"), col("in_reply_to"),
      col("retweet_of"), col("quotes"),
      col("reply_count"), col("quote_count"), col("like_count"),
      col("retweet_count"), col("user_id").as("group_id")).as[TreeInput]
    input.cache().count() // isolate the operator from the scan

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[treebench] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val inputDay = graft.queries.GraphQueries.eventsAsTweets(spark, sfDir, dayChains = true)
      .select(
        col("tweet_id"), col("author_id"), col("in_reply_to"),
        col("retweet_of"), col("quotes"),
        col("reply_count"), col("quote_count"), col("like_count"),
        col("retweet_count"), col("user_id").as("group_id")).as[TreeInput]
    inputDay.cache().count()

    for (round <- 1 to 3) {
      time(s"agg r$round")(TreeStats.compute(input).toDF().agg(
        sum(xxhash64(struct(col("*"))))).count())
      time(s"fmg r$round")(TreeStats.computeViaFlatMapGroups(input).toDF().agg(
        sum(xxhash64(struct(col("*"))))).count())
      time(s"itr-day r$round")(graft.stats.TreeStatsIterative.compute(inputDay).toDF().agg(
        sum(xxhash64(struct(col("*"))))).count())
    }
    spark.stop()
  }
}
