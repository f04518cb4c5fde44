package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.pipeline.ConvoyPipeline

/** Regenerates resources/golden_pipeline_hashes.txt — the committed
  * canonical hashes of all 11 pipeline outputs over the deterministic
  * sf0.1-sized [[PageCorpus]]. Review the diff before committing: a
  * changed line means pipeline semantics changed. */
object GenGoldenPipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("page_corpus").toString
    val (orig, exp) = PageCorpus.write(dir)
    val out = ConvoyPipeline.run(spark, orig, exp)
    val tables = Seq(
      "conversation_ids" -> out.conversationIds,
      "tweets_i" -> out.tweets,
      "users_a" -> out.users,
      "tweet_hashtags_a" -> out.hashtags,
      "tweet_urls_a" -> out.urls,
      "tweet_mentions_a" -> out.mentions,
      "tweet_stats_i" -> out.tweetStats,
      "tweets_a" -> out.tweetsWide,
      "conversations_a" -> out.conversations,
      "ur_conversations_a" -> out.urConversations,
      "_quarantine" -> out.corrupt)
    val lines = tables.map { case (name, df) =>
      val (n, h) = PageCorpus.tableHash(df)
      s"$name,$n,$h"
    }
    // relative to the sbt working directory (the repo root), not a
    // machine-specific absolute path
    Files.writeString(
      Paths.get("src/test/resources/golden_pipeline_hashes.txt"),
      lines.mkString("", "\n", "\n"))
    lines.foreach(println)
    spark.stop()
  }
}
