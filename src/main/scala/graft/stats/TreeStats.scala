package graft.stats

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Input row for the tree-statistics stage — mirrors the column list the
  * reference feeds its per-conversation loop
  * (`code/create-db/3_create_tweet_stats_i.py:360`).
  *
  * Exactly one parent edge per node, with reply taking precedence over
  * retweet over quote (`3_create_tweet_stats_i.py:235-240`).
  */
case class TreeInput(
    tweet_id: Long,
    author_id: Long,
    in_reply_to: Option[Long],
    retweet_of: Option[Long],
    quotes: Option[Long],
    reply_count: Long,
    quote_count: Long,
    like_count: Long,
    retweet_count: Long,
    group_id: Long)

/** The 41-column per-tweet statistics row. Column names and order follow
  * the reference's generated DDL (`3_create_tweet_stats_i.py:256-303`:
  * `tweet_id`, then each int stat as `x, ur_x`, then each float stat as
  * `x, ur_x`). Int stats are Long here (transitive sums can exceed int32
  * at 100 TB target scale); float stats are Double.
  */
case class TreeStatsRow(
    tweet_id: Long,
    children: Long, ur_children: Long,
    descendants: Long, ur_descendants: Long,
    leaf_descendants: Long, ur_leaf_descendants: Long,
    max_depth: Long, ur_max_depth: Long,
    t_authors: Long, ur_t_authors: Long,
    t_reply_count: Long, ur_t_reply_count: Long,
    t_quote_count: Long, ur_t_quote_count: Long,
    t_like_count: Long, ur_t_like_count: Long,
    t_retweet_count: Long, ur_t_retweet_count: Long,
    branching_factor: Double, ur_branching_factor: Double,
    mean_depth: Double, ur_mean_depth: Double,
    depth_mad: Double, ur_depth_mad: Double,
    mean_reply_count: Double, ur_mean_reply_count: Double,
    reply_count_mad: Double, ur_reply_count_mad: Double,
    mean_quote_count: Double, ur_mean_quote_count: Double,
    quote_count_mad: Double, ur_quote_count_mad: Double,
    mean_like_count: Double, ur_mean_like_count: Double,
    like_count_mad: Double, ur_like_count_mad: Double,
    mean_retweet_count: Double, ur_mean_retweet_count: Double,
    retweet_count_mad: Double, ur_retweet_count_mad: Double)

/** Per-tweet statistics over each conversation's reply/quote/retweet tree.
  *
  * Re-expresses the reference's driver-side N+1 loop (one SQL round trip
  * per conversation, `3_create_tweet_stats_i.py:353-361`) as ONE Spark job:
  * `groupByKey(group_id).flatMapGroups` — each group rebuilds its forest in
  * memory and runs the same memoized bottom-up computation, emitting one
  * row per tweet. The shuffle key is the conversation id, so the 100 TB
  * plan is a single hash exchange + per-group local work; skew (one mega
  * conversation) lands in one task, same asymptotics as the reference's
  * per-conversation loop but parallel across conversations.
  *
  * Semantics match the reference's de-facto behavior: rows are processed
  * children-before-parents (`ORDER BY tweet_id DESC`,
  * `3_create_tweet_stats_i.py:360` — snowflake ids make replies newer than
  * their parents), which means the memoized branch of `count_statistics`
  * (`:90-111`) always runs. We therefore implement that branch's recursion
  * exactly, via an explicit post-order DFS (correct for any id order):
  *
  *  - descendants(n)      = |C| + Σ_{c∈C} descendants(c)
  *  - ur_descendants(n)   = |C|+|U| + Σ_{x∈C∪U} ur_descendants(x)
  *  - leaf_descendants(n) = Σ_{c∈C}[|C(c)|=0] + Σ_{c∈C} leaf_descendants(c)
  *  - ur_leaf_descendants(n) = Σ_{c∈C}[|C(c)|=0]
  *        + Σ_{u∈U}[|C(u)|=0 ∧ |U(u)|=0] + Σ_{x∈C∪U} ur_leaf_descendants(x)
  *  - max_depth(n)        = max(0, max_{c∈C}(max_depth(c)+1))
  *  - sum_depth(n)        = Σ_{c∈C}(sum_depth(c) + leaf_descendants(c))
  *    (note: a leaf at depth d contributes d-1 — the reference's memoized
  *    path, `:110`, which is what it actually executes)
  *  - t_X(n)              = X(n) + Σ_{c∈C} t_X(c)   (reply closure)
  *  - ur_t_X(n)           = X(n) + Σ_{x∈C∪U} ur_t_X(x)
  *  - t_authors(n)        = |{author(n)} ∪ ⋃_{c∈C} authors(c)| (exact set)
  *  - MADs cover self + DIRECT children only (the reference's
  *    `count_mads` stack never descends, `:166-178`), against the
  *    subtree mean; `depth_mad` uses the PLAIN `max_depth` of children
  *    even in the ur variant (`:145`).
  *  - emitted means/mads are normalized by (1+descendants) (`:200-221`);
  *    `depth_mad` stays raw; `mad_t_authors` is dead code in the
  *    reference (computed `:146-147`, never emitted) and is dropped.
  *
  * Deviations (documented per SURVEY §7.6): cycles (impossible in real
  * reply trees, unguarded in the reference) are broken deterministically —
  * an edge to an ancestor contributes nothing; author sets are merged
  * small-to-large and freed once the parent consumes them.
  */
object TreeStats {

  private final class Node(val id: Long) {
    var present = false
    var author = -1L
    var reply, quote, like, retweet = 0L
    val children = new mutable.ArrayBuffer[Node](2)
    val urChildren = new mutable.ArrayBuffer[Node](0)
    // 0 = untouched, 1 = on DFS path (in progress), 2 = computed
    var state = 0
    var desc, urDesc, leafDesc, urLeafDesc = 0L
    var maxDepth, urMaxDepth, sumDepth, urSumDepth = 0L
    var tReply, urTReply, tQuote, urTQuote = 0L
    var tLike, urTLike, tRetweet, urTRetweet = 0L
    var tAuthors: java.util.HashSet[Long] = _
    var urTAuthors: java.util.HashSet[Long] = _
    var nTAuthors, nUrTAuthors = 0L
    var madDepth, urMadDepth = 0.0
    var madReply, urMadReply, madQuote, urMadQuote = 0.0
    var madLike, urMadLike, madRetweet, urMadRetweet = 0.0
  }

  /** Steal the largest child set, merge the rest — keeps total set work
    * O(n log n) per group instead of O(n * depth). */
  private def mergeSets(own: Long, sets: Seq[java.util.HashSet[Long]]): java.util.HashSet[Long] = {
    val acc =
      if (sets.isEmpty) new java.util.HashSet[Long](4)
      else {
        val biggest = sets.maxBy(_.size)
        sets.foreach(s => if (s ne biggest) biggest.addAll(s))
        biggest
      }
    acc.add(own)
    acc
  }

  private def combine(n: Node): Unit = {
    val cs = n.children
    val us = n.urChildren
    n.desc = cs.size.toLong
    n.urDesc = cs.size.toLong + us.size.toLong
    var leafInit = 0L
    cs.foreach(c => if (c.children.isEmpty) leafInit += 1)
    n.leafDesc = leafInit
    var urLeafInit = leafInit
    us.foreach(u => if (u.children.isEmpty && u.urChildren.isEmpty) urLeafInit += 1)
    n.urLeafDesc = urLeafInit
    n.tReply = n.reply; n.urTReply = n.reply
    n.tQuote = n.quote; n.urTQuote = n.quote
    n.tLike = n.like; n.urTLike = n.like
    n.tRetweet = n.retweet; n.urTRetweet = n.retweet
    cs.foreach { c =>
      if (c.state == 2) {
        n.desc += c.desc
        n.tReply += c.tReply; n.tQuote += c.tQuote
        n.tLike += c.tLike; n.tRetweet += c.tRetweet
        if (c.maxDepth + 1 > n.maxDepth) n.maxDepth = c.maxDepth + 1
        n.sumDepth += c.sumDepth + c.leafDesc
        n.leafDesc += c.leafDesc
      }
    }
    (cs.iterator ++ us.iterator).foreach { x =>
      if (x.state == 2) {
        n.urDesc += x.urDesc
        n.urTReply += x.urTReply; n.urTQuote += x.urTQuote
        n.urTLike += x.urTLike; n.urTRetweet += x.urTRetweet
        if (x.urMaxDepth + 1 > n.urMaxDepth) n.urMaxDepth = x.urMaxDepth + 1
        n.urSumDepth += x.urSumDepth + x.urLeafDesc
        n.urLeafDesc += x.urLeafDesc
      }
    }
    n.tAuthors = mergeSets(n.author, cs.collect { case c if c.state == 2 && c.tAuthors != null => c.tAuthors }.toSeq)
    n.urTAuthors = mergeSets(n.author,
      (cs.iterator ++ us.iterator).collect { case x if x.state == 2 && x.urTAuthors != null => x.urTAuthors }.toSeq)
    cs.foreach(c => { c.tAuthors = null; c.urTAuthors = null })
    us.foreach(u => { u.tAuthors = null; u.urTAuthors = null })
    n.nTAuthors = n.tAuthors.size.toLong
    n.nUrTAuthors = n.urTAuthors.size.toLong

    // MADs: self + direct children vs the subtree mean (count_mads never
    // descends past depth 1 in the reference).
    val meanDepth = if (n.leafDesc != 0) n.sumDepth.toDouble / n.leafDesc else 0.0
    n.madDepth =
      if (n.leafDesc != 0) cs.iterator.map(c => math.abs(meanDepth - c.maxDepth)).sum / cs.size
      else 0.0
    val urMeanDepth = if (n.urLeafDesc != 0) n.urSumDepth.toDouble / n.urLeafDesc else 0.0
    n.urMadDepth =
      if (n.urLeafDesc != 0)
        (cs.iterator ++ us.iterator).map(x => math.abs(urMeanDepth - x.maxDepth)).sum / (cs.size + us.size)
      else 0.0
    val meanReply = n.tReply.toDouble / (n.desc + 1)
    val meanQuote = n.tQuote.toDouble / (n.desc + 1)
    val meanLike = n.tLike.toDouble / (n.desc + 1)
    val meanRetweet = n.tRetweet.toDouble / (n.desc + 1)
    n.madReply = math.abs(n.reply - meanReply)
    n.madQuote = math.abs(n.quote - meanQuote)
    n.madLike = math.abs(n.like - meanLike)
    n.madRetweet = math.abs(n.retweet - meanRetweet)
    cs.foreach { c =>
      n.madReply += math.abs(c.reply - meanReply)
      n.madQuote += math.abs(c.quote - meanQuote)
      n.madLike += math.abs(c.like - meanLike)
      n.madRetweet += math.abs(c.retweet - meanRetweet)
    }
    val urMeanReply = n.urTReply.toDouble / (n.urDesc + 1)
    val urMeanQuote = n.urTQuote.toDouble / (n.urDesc + 1)
    val urMeanLike = n.urTLike.toDouble / (n.urDesc + 1)
    val urMeanRetweet = n.urTRetweet.toDouble / (n.urDesc + 1)
    n.urMadReply = math.abs(n.reply - urMeanReply)
    n.urMadQuote = math.abs(n.quote - urMeanQuote)
    n.urMadLike = math.abs(n.like - urMeanLike)
    n.urMadRetweet = math.abs(n.retweet - urMeanRetweet)
    (cs.iterator ++ us.iterator).foreach { x =>
      n.urMadReply += math.abs(x.reply - urMeanReply)
      n.urMadQuote += math.abs(x.quote - urMeanQuote)
      n.urMadLike += math.abs(x.like - urMeanLike)
      n.urMadRetweet += math.abs(x.retweet - urMeanRetweet)
    }
  }

  /** Iterative post-order DFS (no recursion — real chains can be deeper
    * than the JVM stack). */
  private def computeFrom(start: Node): Unit = {
    if (start.state == 2) return
    val stack = new mutable.ArrayBuffer[Node](16)
    stack += start
    while (stack.nonEmpty) {
      val n = stack.last
      n.state match {
        case 2 => stack.dropRightInPlace(1)
        case 1 =>
          combine(n)
          n.state = 2
          stack.dropRightInPlace(1)
        case _ =>
          n.state = 1
          n.children.foreach(c => if (c.state == 0) stack += c)
          n.urChildren.foreach(u => if (u.state == 0) stack += u)
      }
    }
  }

  private def emit(n: Node): TreeStatsRow = {
    val d1 = n.desc + 1.0
    val urD1 = n.urDesc + 1.0
    TreeStatsRow(
      tweet_id = n.id,
      children = n.children.size.toLong,
      ur_children = n.children.size.toLong + n.urChildren.size.toLong,
      descendants = n.desc, ur_descendants = n.urDesc,
      leaf_descendants = n.leafDesc, ur_leaf_descendants = n.urLeafDesc,
      max_depth = n.maxDepth, ur_max_depth = n.urMaxDepth,
      t_authors = n.nTAuthors, ur_t_authors = n.nUrTAuthors,
      t_reply_count = n.tReply, ur_t_reply_count = n.urTReply,
      t_quote_count = n.tQuote, ur_t_quote_count = n.urTQuote,
      t_like_count = n.tLike, ur_t_like_count = n.urTLike,
      t_retweet_count = n.tRetweet, ur_t_retweet_count = n.urTRetweet,
      branching_factor = n.desc.toDouble / (1 + n.desc - n.leafDesc),
      ur_branching_factor = n.urDesc.toDouble / (1 + n.urDesc - n.urLeafDesc),
      mean_depth = if (n.leafDesc != 0) n.sumDepth.toDouble / n.leafDesc else 0.0,
      ur_mean_depth = if (n.urLeafDesc != 0) n.urSumDepth.toDouble / n.urLeafDesc else 0.0,
      depth_mad = n.madDepth, ur_depth_mad = n.urMadDepth,
      mean_reply_count = n.tReply / d1, ur_mean_reply_count = n.urTReply / urD1,
      reply_count_mad = n.madReply / d1, ur_reply_count_mad = n.urMadReply / urD1,
      mean_quote_count = n.tQuote / d1, ur_mean_quote_count = n.urTQuote / urD1,
      quote_count_mad = n.madQuote / d1, ur_quote_count_mad = n.urMadQuote / urD1,
      mean_like_count = n.tLike / d1, ur_mean_like_count = n.urTLike / urD1,
      like_count_mad = n.madLike / d1, ur_like_count_mad = n.urMadLike / urD1,
      mean_retweet_count = n.tRetweet / d1, ur_mean_retweet_count = n.urTRetweet / urD1,
      retweet_count_mad = n.madRetweet / d1, ur_retweet_count_mad = n.urMadRetweet / urD1)
  }

  /** One group = one ur-conversation's forest. Pure local computation —
    * called from flatMapGroups and directly from unit/property tests. */
  def processGroup(rows: Iterator[TreeInput]): Iterator[TreeStatsRow] = {
    // children-before-parents like the reference (ORDER BY tweet_id DESC);
    // our DFS is order-correct anyway, but this makes child-list order —
    // and hence MAD float summation order — deterministic.
    val rs = rows.toArray.sortBy(-_.tweet_id)
    val nodes = new mutable.LongMap[Node](rs.length * 2)
    def nodeOf(id: Long): Node = nodes.getOrElseUpdate(id, new Node(id))
    rs.foreach { r =>
      val n = nodeOf(r.tweet_id)
      n.present = true
      n.author = r.author_id
      n.reply = r.reply_count; n.quote = r.quote_count
      n.like = r.like_count; n.retweet = r.retweet_count
      // one parent edge, reply > retweet > quote precedence; parents that
      // are not in the data become placeholder nodes (never emitted),
      // exactly like the reference's lru_cache interning (:226-240)
      r.in_reply_to match {
        case Some(p) => nodeOf(p).children += n
        case None => r.retweet_of match {
          case Some(p) => nodeOf(p).urChildren += n
          case None => r.quotes.foreach(p => nodeOf(p).urChildren += n)
        }
      }
    }
    rs.foreach(r => computeFrom(nodes(r.tweet_id)))
    rs.iterator.map(r => emit(nodes(r.tweet_id)))
  }

  /** Distributed entry point: one hash aggregate on `group_id`, local
    * trees inside [[graft.functions.TreeStatsAgg]] (a
    * TypedImperativeAggregate — packs rows map-side, no per-row Encoder
    * deserialization, no sort-based grouping), exploded back to one row
    * per tweet. */
  def compute(tweets: Dataset[TreeInput]): Dataset[TreeStatsRow] = {
    val spark = tweets.sparkSession
    import spark.implicits._
    graft.functions.TreeStatsAgg.register(spark)
    tweets.toDF()
      .groupBy(col("group_id"))
      .agg(call_function("tree_stats_agg",
        col("tweet_id"), col("author_id"), col("in_reply_to"),
        col("retweet_of"), col("quotes"), col("reply_count"),
        col("quote_count"), col("like_count"), col("retweet_count")).as("stats"))
      .select(explode(col("stats")).as("s"))
      .select(col("s.*"))
      .as[TreeStatsRow]
  }

  /** The pre-aggregate formulation (`groupByKey` + `flatMapGroups`) —
    * kept as the parity reference for [[compute]] and as a fallback;
    * same semantics, heavier per-row deserialization. */
  def computeViaFlatMapGroups(tweets: Dataset[TreeInput]): Dataset[TreeStatsRow] = {
    val spark = tweets.sparkSession
    import spark.implicits._
    tweets.groupByKey(_.group_id).flatMapGroups((_, rows) => processGroup(rows))
  }

  /** The reference's singleton fast path (`3_create_tweet_stats_i.py:304-352`):
    * conversations of size 1 skip tree building entirely and get constant /
    * copied stats. Pure DataFrame rewrite — `groupBy.count` split + constant
    * projection; for root singletons the results equal the tree path on a
    * 1-node tree (verified by SparkEntrySpec), so `compute` doesn't need
    * the split; this exists as the explicit P13 operator.
    *
    * Edge-case fidelity: like the reference, a singleton group whose sole
    * tweet is NOT the group root (orphaned reply, `tweet_id != group_id`)
    * gets NO row here — the reference's `WHERE tweet_id IN (... HAVING
    * COUNT(*)=1)` drops it from the fast path and `HAVING COUNT(*)>1`
    * drops it from the tree path, so it falls through both. The unified
    * [[compute]] is a superset: it DOES emit a row for such tweets.
    */
  def singletonStats(tweets: DataFrame, groupCol: String = "group_id"): DataFrame = {
    val singles = tweets.groupBy(col(groupCol)).count().where(col("count") === 1)
      .select(col(groupCol).as("_sg"))
    val zeroL = lit(0L)
    val zeroD = lit(0.0)
    tweets
      .join(singles, tweets(groupCol) === col("_sg"), "left_semi")
      .where(col("tweet_id") === col(groupCol))
      .select(
        col("tweet_id"),
        zeroL.as("children"), zeroL.as("ur_children"),
        zeroL.as("descendants"), zeroL.as("ur_descendants"),
        zeroL.as("leaf_descendants"), zeroL.as("ur_leaf_descendants"),
        zeroL.as("max_depth"), zeroL.as("ur_max_depth"),
        lit(1L).as("t_authors"), lit(1L).as("ur_t_authors"),
        col("reply_count").cast("long").as("t_reply_count"),
        col("reply_count").cast("long").as("ur_t_reply_count"),
        col("quote_count").cast("long").as("t_quote_count"),
        col("quote_count").cast("long").as("ur_t_quote_count"),
        col("like_count").cast("long").as("t_like_count"),
        col("like_count").cast("long").as("ur_t_like_count"),
        col("retweet_count").cast("long").as("t_retweet_count"),
        col("retweet_count").cast("long").as("ur_t_retweet_count"),
        zeroD.as("branching_factor"), zeroD.as("ur_branching_factor"),
        zeroD.as("mean_depth"), zeroD.as("ur_mean_depth"),
        zeroD.as("depth_mad"), zeroD.as("ur_depth_mad"),
        col("reply_count").cast("double").as("mean_reply_count"),
        col("reply_count").cast("double").as("ur_mean_reply_count"),
        zeroD.as("reply_count_mad"), zeroD.as("ur_reply_count_mad"),
        col("quote_count").cast("double").as("mean_quote_count"),
        col("quote_count").cast("double").as("ur_mean_quote_count"),
        zeroD.as("quote_count_mad"), zeroD.as("ur_quote_count_mad"),
        col("like_count").cast("double").as("mean_like_count"),
        col("like_count").cast("double").as("ur_mean_like_count"),
        zeroD.as("like_count_mad"), zeroD.as("ur_like_count_mad"),
        col("retweet_count").cast("double").as("mean_retweet_count"),
        col("retweet_count").cast("double").as("ur_mean_retweet_count"),
        zeroD.as("retweet_count_mad"), zeroD.as("ur_retweet_count_mad"))
  }
}
