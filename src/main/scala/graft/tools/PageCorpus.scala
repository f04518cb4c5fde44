package graft.tools

import java.nio.file.{Files, Paths}

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sf0.1-sized JSONL page-corpus generator for the
  * end-to-end pipeline golden test (dev tool, not engine code).
  *
  * Reproduces every ingest-relevant shape of the reference's crawl output
  * (`1_initial_load.py`): multi-file original + expansion page sets,
  * `data[]` + `includes.tweets/users` (with cross-page duplicate copies,
  * exercising first-wins dedup), `errors[]` of all three kinds (tweet,
  * `in_reply_to_user_id`, `entities.mentions.username`), corrupt JSON
  * lines, t.co URL rewrites, hashtags/mentions, reply trees with
  * quote/retweet cross-conversation links (driving the ur-closure), and
  * expansion re-fetches with drifted counts that dedup must lose.
  *
  * Determinism: single seeded LCG (`scala.util.Random`), fixed file
  * names, content independent of wall clock or paths — the same seed
  * yields byte-identical files on any machine, which is what lets the
  * committed golden hashes (resources/golden_pipeline_hashes.txt) be
  * asserted in CI.
  */
object PageCorpus {

  final case class Tweet(id: Long, conv: Long, author: Long,
                         replyTo: Option[Long], replyToUser: Option[Long],
                         quoted: Option[Long], retweeted: Option[Long],
                         nReplies: Int, hashtags: Seq[String],
                         mentions: Seq[(String, Long)], withUrl: Boolean)

  val ORIG_FILES = 8
  val EXP_FILES = 4
  val PAGE_SIZE = 120

  private def ts(id: Long): String = {
    // ids ascending in time, one tweet per ~3 s across Feb 2022
    val s = (id - 1000000L) * 3
    f"2022-02-${1 + s / 86400}%02dT${s % 86400 / 3600}%02d:${s % 3600 / 60}%02d:${s % 60}%02d.000Z"
  }

  private def tweetJson(t: Tweet, counts: (Long, Long, Long, Long)): String = {
    val sb = new StringBuilder(256)
    sb ++= s"""{"id": "${t.id}", "conversation_id": "${t.conv}", "author_id": "${t.author}", """
    sb ++= s""""created_at": "${ts(t.id)}", "lang": "${if (t.id % 5 == 0) "fi" else "en"}", """
    val url = if (t.withUrl) s" https://t.co/x${t.id}" else ""
    val tags = t.hashtags.map(" #" + _).mkString
    sb ++= s""""text": "tweet ${t.id} body$url$tags", """
    sb ++= s""""public_metrics": {"retweet_count": ${counts._1}, "reply_count": ${counts._2}, "like_count": ${counts._3}, "quote_count": ${counts._4}}"""
    t.replyToUser.foreach(u => sb ++= s""", "in_reply_to_user_id": "$u"""")
    val refs =
      t.replyTo.map(p => s"""{"type": "replied_to", "id": "$p"}""").toSeq ++
      t.quoted.map(p => s"""{"type": "quoted", "id": "$p"}""").toSeq ++
      t.retweeted.map(p => s"""{"type": "retweeted", "id": "$p"}""").toSeq
    if (refs.nonEmpty) sb ++= refs.mkString(", \"referenced_tweets\": [", ", ", "]")
    val ents = new StringBuilder
    if (t.hashtags.nonEmpty)
      ents ++= t.hashtags.map(h => s"""{"tag": "$h"}""").mkString("\"hashtags\": [", ", ", "]")
    if (t.mentions.nonEmpty) {
      if (ents.nonEmpty) ents ++= ", "
      ents ++= t.mentions.map { case (u, i) => s"""{"username": "$u", "id": "$i"}""" }
        .mkString("\"mentions\": [", ", ", "]")
    }
    if (t.withUrl) {
      if (ents.nonEmpty) ents ++= ", "
      ents ++= s""""urls": [{"url": "https://t.co/x${t.id}", "expanded_url": "https://example.org/a/${t.id}"}]"""
    }
    if (ents.nonEmpty) sb ++= s""", "entities": {$ents}"""
    sb ++= "}"
    sb.toString
  }

  private def userJson(id: Long): String = {
    val vrf = id % 7 == 0
    val empty = id % 11 == 0 // empty-string url/location → nullif path
    val url = if (empty) "" else s"https://t.co/u$id"
    val loc = if (empty) "" else s"city${id % 37}"
    val desc = if (id % 13 == 0) "" else s"user $id writes things https://t.co/u$id"
    val ent = if (empty) ""
      else s""", "entities": {"url": {"urls": [{"url": "https://t.co/u$id", "expanded_url": "https://u$id.example.net"}]}}"""
    s"""{"id": "$id", "username": "u$id", "name": "User $id", "description": "$desc", """ +
      s""""created_at": "2020-0${1 + id % 9}-1${id % 9}T0${id % 9}:00:00.000Z", """ +
      s""""verified": $vrf, "protected": ${id % 17 == 0}, "url": "$url", "location": "$loc", """ +
      s""""public_metrics": {"followers_count": ${id % 5000}, "following_count": ${id % 800}, "tweet_count": ${id % 20000}, "listed_count": ${id % 40}}$ent}"""
  }

  /** Build the full corpus model + serialize to `dir`. Returns
    * (originalPaths, expansionPaths). */
  def write(dir: String): (Seq[String], Seq[String]) = {
    val rnd = new Random(20260812L)
    val nUsers = 5000
    var nextId = 1000001L
    val tweets = scala.collection.mutable.ArrayBuffer.empty[Tweet]
    val allIds = scala.collection.mutable.ArrayBuffer.empty[Long]

    def newTweet(conv: Long, replyTo: Option[Long], replyToUser: Option[Long],
                 quoted: Option[Long], retweeted: Option[Long]): Tweet = {
      val id = nextId; nextId += 1
      val author = 1 + rnd.nextInt(nUsers).toLong
      val tags = if (rnd.nextInt(4) == 0) Seq(s"h${rnd.nextInt(50)}", s"h${rnd.nextInt(50)}").distinct
        else if (rnd.nextInt(3) == 0) Seq(s"h${rnd.nextInt(50)}") else Nil
      val ments = if (rnd.nextInt(5) == 0) {
        val m = 1 + rnd.nextInt(nUsers).toLong
        Seq((s"u$m", m))
      } else Nil
      val t = Tweet(id, conv, author, replyTo, replyToUser, quoted, retweeted,
        0, tags, ments, withUrl = rnd.nextInt(4) == 0)
      tweets += t; allIds += id
      t
    }

    // ── conversation forest: 3500 conversations, ~25 tweets avg ──────
    var c = 0
    while (c < 3500) {
      // a third of roots quote/retweet an earlier tweet → conv→conv edges
      val (q, rt) =
        if (allIds.nonEmpty && rnd.nextInt(3) == 0) {
          val target = allIds(rnd.nextInt(allIds.size))
          if (rnd.nextBoolean()) (Some(target), None) else (None, Some(target))
        } else (None, None)
      val rootId = nextId
      val root = newTweet(rootId, None, None, q, rt)
      val members = scala.collection.mutable.ArrayBuffer(root)
      val size = rnd.nextInt(50) // geometric-ish mix incl. singletons
      var k = 0
      while (k < size) {
        val parent = members(rnd.nextInt(members.size))
        // 1.5% of replies ALSO retweet a foreign tweet (unguarded-edge case)
        val alsoRt = if (rnd.nextInt(66) == 0) Some(allIds(rnd.nextInt(allIds.size))) else None
        members += newTweet(rootId, Some(parent.id), Some(parent.author), None, alsoRt)
        k += 1
      }
      c += 1
    }
    val byId = tweets.map(t => t.id -> t).toMap

    // engagement counts: deterministic in id; reply_count reflects real
    // reply children so stage 1 (ids-with-replies) is non-trivial
    val replyChildren = tweets.groupBy(_.replyTo).withDefaultValue(Seq.empty)
    def counts(t: Tweet): (Long, Long, Long, Long) =
      (t.id % 9, replyChildren(Some(t.id)).size.toLong, t.id % 23, t.id % 4)
    // expansion re-fetch: drifted counts — dedup must keep the original
    def driftedCounts(t: Tweet): (Long, Long, Long, Long) =
      (t.id % 9 + 100, replyChildren(Some(t.id)).size.toLong + 100, t.id % 23 + 100, t.id % 4)

    def pageJson(data: Seq[Tweet], incTweets: Seq[Tweet], users: Seq[Long],
                 errors: Seq[String], tok: Int, drifted: Boolean): String = {
      val cf: Tweet => (Long, Long, Long, Long) = if (drifted) driftedCounts else counts
      val sb = new StringBuilder(4096)
      sb ++= data.map(t => tweetJson(t, cf(t))).mkString("""{"data": [""", ", ", "]")
      sb ++= ", \"includes\": {"
      if (incTweets.nonEmpty)
        sb ++= incTweets.map(t => tweetJson(t, cf(t))).mkString("\"tweets\": [", ", ", "], ")
      sb ++= users.distinct.map(userJson).mkString("\"users\": [", ", ", "]")
      sb ++= s"""}, "meta": {"next_token": "tok$tok"}"""
      errors.headOption.foreach(_ => sb ++= errors.mkString(", \"errors\": [", ", ", "]"))
      sb ++= "}"
      sb.toString
    }

    def errorsFor(pageNo: Int): Seq[String] = {
      if (pageNo % 17 == 3) Seq(
        s"""{"resource_type": "tweet", "resource_id": "${4000000L + pageNo}", "parameter": "ids", "title": "Not Found Error", "detail": "Could not find tweet with ids: [${4000000L + pageNo}]."}""")
      else if (pageNo % 17 == 8) Seq(
        s"""{"resource_type": "user", "resource_id": "${1 + pageNo % nUsers}", "parameter": "in_reply_to_user_id", "title": "Forbidden", "detail": "User has been suspended."}""")
      else if (pageNo % 17 == 12) Seq(
        s"""{"resource_type": "user", "resource_id": "u${1 + pageNo % nUsers}", "parameter": "entities.mentions.username", "title": "Not Found Error", "detail": "Could not find user with usernames: [u${1 + pageNo % nUsers}]."}""")
      else Nil
    }

    Files.createDirectories(Paths.get(dir))
    var pageNo = 0
    def writeFiles(prefix: String, nFiles: Int, pages: Seq[Seq[Tweet]],
                   drifted: Boolean): Seq[String] = {
      val perFile = (pages.size + nFiles - 1) / nFiles
      (0 until nFiles).map { f =>
        val path = s"$dir/${prefix}_$f.jsonl"
        val sb = new StringBuilder(1 << 20)
        for (page <- pages.slice(f * perFile, (f + 1) * perFile)) {
          pageNo += 1
          // includes.tweets: referenced parents (cross-page dup copies)
          val inc = page.flatMap(t => t.replyTo ++ t.quoted ++ t.retweeted)
            .distinct.flatMap(byId.get).take(5)
          val users = (page.map(_.author) ++ inc.map(_.author) ++
            page.flatMap(_.mentions.map(_._2))).distinct
          sb ++= pageJson(page, inc, users, errorsFor(pageNo), pageNo, drifted)
          sb ++= "\n"
          if (pageNo % 23 == 11) sb ++= s"corrupt page $pageNo {{{not json\n"
        }
        Files.writeString(Paths.get(path), sb.toString)
        path
      }
    }

    val origPages = tweets.grouped(PAGE_SIZE).map(_.toSeq).toSeq
    val origPaths = writeFiles("pages_orig", ORIG_FILES, origPages, drifted = false)

    // expansion: re-fetch of every 6th tweet with drifted counts (losers)
    // + fresh late replies to random originals (winners, new ids)
    val refetch = tweets.zipWithIndex.collect { case (t, i) if i % 6 == 0 => t }
    val origIds = allIds.toIndexedSeq // late replies attach to ORIGINAL tweets
    val late = (1 to 12000).map { _ =>
      val parent = byId(origIds(rnd.nextInt(origIds.size)))
      newTweet(parent.conv, Some(parent.id), Some(parent.author), None, None)
    }
    val expPages = (refetch ++ late).grouped(PAGE_SIZE).map(_.toSeq).toSeq
    val expPaths = writeFiles("pages_exp", EXP_FILES, expPages, drifted = true)
    (origPaths, expPaths)
  }

  /** Order-independent canonical table hash: xxhash64 per row over all
    * columns (file-path columns reduced to basenames), summed with
    * 64-bit wraparound. Sum, not XOR: an XOR fold cancels even
    * multiplicities (swapping a duplicated row X for a duplicated row Y
    * leaves count and XOR unchanged), so it is blind to exactly the
    * duplicate-shaped regressions a dedup pipeline must catch. */
  def tableHash(df: DataFrame): (Long, Long) = {
    val cols = df.columns.toSeq.map { c =>
      if (c == "src_file") regexp_extract(col(c), "[^/]+$", 0).as(c) else col(c)
    }
    // sum into raw 64-bit lanes: cast through unsigned-wrap semantics by
    // summing mod 2^64 via two 32-bit halves (Spark's sum on LONG throws
    // on overflow under ANSI; split-lane sums cannot overflow a long)
    val r = df.select(xxhash64(cols: _*).as("h"))
      .select(
        shiftrightunsigned(col("h"), 32).as("hi"),
        col("h").bitwiseAND(lit(0xFFFFFFFFL)).as("lo"))
      .agg(count(lit(1)), sum(col("hi")), sum(col("lo"))).head()
    val n = r.getLong(0)
    val hi = if (r.isNullAt(1)) 0L else r.getLong(1)
    val lo = if (r.isNullAt(2)) 0L else r.getLong(2)
    (n, (hi << 32) + lo) // wraps mod 2^64 like an unsigned sum of h
  }
}
