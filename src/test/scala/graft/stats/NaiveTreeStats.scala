package graft.stats

import scala.collection.mutable

/** Independent reference implementation of the tree statistics, written
  * as direct recursions over child lists (vs. the engine's iterative
  * post-order DFS with small-to-large set merging). Property tests
  * compare the two on random forests.
  */
object NaiveTreeStats {

  def compute(rows: Seq[TreeInput]): Map[Long, TreeStatsRow] = {
    val sorted = rows.sortBy(-_.tweet_id)
    val byId = sorted.map(r => r.tweet_id -> r).toMap
    val c = mutable.LinkedHashMap[Long, Vector[Long]]().withDefaultValue(Vector.empty)
    val u = mutable.LinkedHashMap[Long, Vector[Long]]().withDefaultValue(Vector.empty)
    sorted.foreach { r =>
      r.in_reply_to match {
        case Some(p) => c(p) = c(p) :+ r.tweet_id
        case None => r.retweet_of.orElse(r.quotes) match {
          case Some(p) => u(p) = u(p) :+ r.tweet_id
          case None =>
        }
      }
    }
    def metric(id: Long, f: TreeInput => Long): Long = byId.get(id).map(f).getOrElse(0L)

    val memo = mutable.Map[Long, NodeStats]()
    case class NodeStats(desc: Long, urDesc: Long, leaf: Long, urLeaf: Long,
                         maxD: Long, urMaxD: Long, sumD: Long, urSumD: Long,
                         t: Map[String, Long], urT: Map[String, Long],
                         authors: Set[Long], urAuthors: Set[Long])
    val metrics: Map[String, TreeInput => Long] = Map(
      "reply" -> (_.reply_count), "quote" -> (_.quote_count),
      "like" -> (_.like_count), "retweet" -> (_.retweet_count))

    def stats(id: Long, inFlight: Set[Long]): NodeStats = memo.getOrElseUpdate(id, {
      val cs = c(id).filterNot(inFlight)
      val us = u(id).filterNot(inFlight)
      val csS = cs.map(x => stats(x, inFlight + id))
      val usS = us.map(x => stats(x, inFlight + id))
      val allS = csS ++ usS
      NodeStats(
        desc = cs.size + csS.map(_.desc).sum,
        urDesc = cs.size + us.size + allS.map(_.urDesc).sum,
        leaf = cs.count(x => c(x).isEmpty) + csS.map(_.leaf).sum,
        urLeaf = cs.count(x => c(x).isEmpty) +
          us.count(x => c(x).isEmpty && u(x).isEmpty) + allS.map(_.urLeaf).sum,
        maxD = (0L +: csS.map(_.maxD + 1)).max,
        urMaxD = (0L +: allS.map(_.urMaxD + 1)).max,
        sumD = csS.map(s => s.sumD + s.leaf).sum,
        urSumD = allS.map(s => s.urSumD + s.urLeaf).sum,
        t = metrics.map { case (k, f) => k -> (metric(id, f) + csS.map(_.t(k)).sum) },
        urT = metrics.map { case (k, f) => k -> (metric(id, f) + allS.map(_.urT(k)).sum) },
        authors = csS.map(_.authors).fold(Set(metric(id, _.author_id)))(_ ++ _),
        urAuthors = allS.map(_.urAuthors).fold(Set(metric(id, _.author_id)))(_ ++ _))
    })

    rows.map { r =>
      val id = r.tweet_id
      val s = stats(id, Set.empty)
      val cs = c(id)
      val us = u(id)
      val d1 = s.desc + 1.0
      val urD1 = s.urDesc + 1.0
      val meanDepth = if (s.leaf != 0) s.sumD.toDouble / s.leaf else 0.0
      val urMeanDepth = if (s.urLeaf != 0) s.urSumD.toDouble / s.urLeaf else 0.0
      def mad(f: TreeInput => Long, mean: Double): Double =
        math.abs(metric(id, f) - mean) + cs.map(x => math.abs(metric(x, f) - mean)).sum
      def urMad(f: TreeInput => Long, mean: Double): Double =
        math.abs(metric(id, f) - mean) + (cs ++ us).map(x => math.abs(metric(x, f) - mean)).sum
      val means = metrics.map { case (k, _) => k -> s.t(k) / d1 }
      val urMeans = metrics.map { case (k, _) => k -> s.urT(k) / urD1 }
      id -> TreeStatsRow(
        tweet_id = id,
        children = cs.size, ur_children = cs.size + us.size,
        descendants = s.desc, ur_descendants = s.urDesc,
        leaf_descendants = s.leaf, ur_leaf_descendants = s.urLeaf,
        max_depth = s.maxD, ur_max_depth = s.urMaxD,
        t_authors = s.authors.size, ur_t_authors = s.urAuthors.size,
        t_reply_count = s.t("reply"), ur_t_reply_count = s.urT("reply"),
        t_quote_count = s.t("quote"), ur_t_quote_count = s.urT("quote"),
        t_like_count = s.t("like"), ur_t_like_count = s.urT("like"),
        t_retweet_count = s.t("retweet"), ur_t_retweet_count = s.urT("retweet"),
        branching_factor = s.desc.toDouble / (1 + s.desc - s.leaf),
        ur_branching_factor = s.urDesc.toDouble / (1 + s.urDesc - s.urLeaf),
        mean_depth = meanDepth, ur_mean_depth = urMeanDepth,
        depth_mad = if (s.leaf != 0)
          cs.map(x => math.abs(meanDepth - memo(x).maxD)).sum / cs.size else 0.0,
        ur_depth_mad = if (s.urLeaf != 0)
          (cs ++ us).map(x => math.abs(urMeanDepth - memo(x).maxD)).sum / (cs.size + us.size)
        else 0.0,
        mean_reply_count = means("reply"), ur_mean_reply_count = urMeans("reply"),
        reply_count_mad = mad(_.reply_count, means("reply")) / d1,
        ur_reply_count_mad = urMad(_.reply_count, urMeans("reply")) / urD1,
        mean_quote_count = means("quote"), ur_mean_quote_count = urMeans("quote"),
        quote_count_mad = mad(_.quote_count, means("quote")) / d1,
        ur_quote_count_mad = urMad(_.quote_count, urMeans("quote")) / urD1,
        mean_like_count = means("like"), ur_mean_like_count = urMeans("like"),
        like_count_mad = mad(_.like_count, means("like")) / d1,
        ur_like_count_mad = urMad(_.like_count, urMeans("like")) / urD1,
        mean_retweet_count = means("retweet"), ur_mean_retweet_count = urMeans("retweet"),
        retweet_count_mad = mad(_.retweet_count, means("retweet")) / d1,
        ur_retweet_count_mad = urMad(_.retweet_count, urMeans("retweet")) / urD1)
    }.toMap
  }
}
