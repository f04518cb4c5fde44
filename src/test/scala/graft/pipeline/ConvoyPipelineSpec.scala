package graft.pipeline

import java.nio.file.Files

import graft.SparkSuite

/** Full-pipeline test over the JSONL fixture: every stage produces the
  * expected relations and the marts land on disk (S2/K4 round trip
  * included: the id-list text sink is read back with spark.read.text).
  */
class ConvoyPipelineSpec extends SparkSuite {

  private lazy val out = ConvoyPipeline.run(spark,
    Seq(resource("pages_original.jsonl")), Seq(resource("pages_expansion.jsonl")))

  test("conversation ids with replies") {
    val ids = out.conversationIds.collect().map(_.getLong(0)).toSet
    // conv 100 (root has replies) and conv 50 (quoted tweet has 1 reply)
    assert(ids == Set(100L, 50L))
  }

  test("ur-conversation closure links quoting/retweeting conversations") {
    val byId = out.tweets.select("tweet_id", "ur_conversation_id")
      .where("ur_conversation_id IS NOT NULL")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // tweet 102 replies (reply precedence) → no edge from conv 100;
    // tweet 200 retweets 100 → conv 200 collapses into conv 100
    assert(byId(200L) == 100L)
    assert(byId(100L) == 100L && byId(101L) == 100L)
    assert(byId(50L) == 50L)
  }

  test("tree stats emitted for every tweet with a conversation, invariants hold") {
    // error placeholder 999 has NULL ur_conversation_id → no stats row
    assert(out.tweetStats.count() ==
      out.tweets.where("ur_conversation_id IS NOT NULL").count())
    val bad = out.tweetStats.where("leaf_descendants > descendants").count()
    assert(bad == 0) // the reference's own runtime guard (3_create...:246)
  }

  test("wide mart carries stats and calendar columns") {
    val r = out.tweetsWide.where("tweet_id = 100").collect().head
    assert(r.getAs[Int]("created_year") == 2022)
    assert(r.getAs[Long]("descendants") == 2) // replies 101, 102
    assert(r.getAs[Long]("ur_descendants") == 3) // + retweet 200
  }

  test("conversation rollups preserve aggregate side") {
    val conv = out.conversations.where("conversation_key = 100").collect().head
    assert(conv.getAs[Long]("tweets") == 4) // 100,101,102,103 (not 200)
    val ur = out.urConversations.where("conversation_key = 100").collect().head
    assert(ur.getAs[Long]("tweets") == 5) // + 200 via ur closure
  }

  test("tweet stats match the committed golden file (all 41 columns)") {
    // regenerate with: sbt "runMain graft.tools.GenGolden" (review the diff!)
    val golden = scala.io.Source.fromFile(resource("golden_tweet_stats.csv"))
      .getLines().toSeq
    val cols = out.tweetStats.columns
    assert(golden.head == cols.mkString(","))
    val got = out.tweetStats.orderBy("tweet_id").collect().map { r =>
      (0 until r.length).map(i => String.valueOf(r.get(i))).mkString(",")
    }.toSeq
    assert(got == golden.tail)
  }

  test("edge extraction: reply guard on quotes only; one parent per id") {
    import spark.implicits._
    // (tweet_id, conversation_id, in_reply_to, quotes, retweet_of)
    val tweets = Seq(
      // parents being linked to
      (10L, 2L, None, None, None),
      (11L, 4L, None, None, None),
      (12L, 5L, None, None, None),
      (13L, 6L, None, None, None),
      // retweet that is ALSO a reply: edge survives (reference guards
      // only the quotes join, 2_enrich_ur_conversation_ids.py:35)
      (20L, 1L, Some(99L), None, Some(10L)),
      // quote that is ALSO a reply: reply precedence, no edge
      (21L, 3L, Some(99L), Some(11L), None),
      // root with BOTH a quote parent and a retweet parent: quote wins
      (22L, 7L, None, Some(12L), None),
      (23L, 7L, None, None, Some(13L)))
      .toDF("tweet_id", "conversation_id", "in_reply_to", "quotes", "retweet_of")
    val edges = ConvoyPipeline.conversationEdges(tweets)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(edges == Map(1L -> 2L, 7L -> 5L))
  }

  test("marts write to disk; id-list text sink reads back (S2/K4)") {
    val dir = Files.createTempDirectory("pipeline_out").toString
    ConvoyPipeline.write(out, dir)
    assert(spark.read.parquet(s"$dir/tweets_a").count() == out.tweets.count())
    val ids = spark.read.text(s"$dir/conversation_ids")
      .collect().map(_.getString(0).toLong).toSet
    assert(ids == Set(100L, 50L))
    assert(spark.read.parquet(s"$dir/_quarantine").count() == 1)
  }
}
