package graft.pipeline

import java.nio.file.Files

import graft.SparkSuite
import graft.tools.PageCorpus

/** End-to-end golden gate at sf0.1 scale: regenerate the deterministic
  * ~100k-tweet multi-file page corpus (originals + expansion re-fetches
  * + all three error kinds + corrupt lines), run the COMPLETE pipeline,
  * and assert the canonical hash of every one of the 11 outputs against
  * the committed golden file.
  *
  * Regenerate after an intentional semantics change with:
  *   sbt "runMain graft.tools.GenGoldenPipeline"   (review the diff!)
  */
class PipelineGoldenSpec extends SparkSuite {

  test("all 11 pipeline outputs hash-match the committed golden file") {
    val dir = Files.createTempDirectory("page_corpus_spec").toString
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
    val golden = scala.io.Source.fromFile(resource("golden_pipeline_hashes.txt"))
      .getLines().filter(_.nonEmpty).map { line =>
        val Array(name, n, h) = line.split(",")
        name -> ((n.toLong, h.toLong))
      }.toMap
    assert(golden.keySet == tables.map(_._1).toSet)
    val diffs = tables.flatMap { case (name, df) =>
      val got = PageCorpus.tableHash(df)
      if (got == golden(name)) None
      else Some(s"$name: got rows=${got._1} hash=${got._2}, " +
        s"want rows=${golden(name)._1} hash=${golden(name)._2}")
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }
}
