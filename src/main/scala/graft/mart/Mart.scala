package graft.mart

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Denormalized analytics marts — the reference's stages 6/7
  * (`4_create_tweets_a.py`, `5_create_conversation_tables.py`).
  */
object Mart {

  /** tweets_a: tweets ⟕ tweet_stats USING(tweet_id) plus calendar
    * derivations (`4_create_tweets_a.py:27-49`). The reference also adds
    * B-tree + FULLTEXT indexes; the Spark analog is the columnar layout
    * plus `Sinks.mart` partition/sort options at write time.
    *
    * `created_week` defaults to ISO `weekofyear` (documented deviation,
    * SURVEY §7.6.4); `mysqlWeekParity = true` opts into exact MySQL
    * `WEEK(ts,1)` numbering ([[graft.functions.MySqlWeek]]) for users
    * diffing against the reference's MariaDB mart.
    */
  def tweetsWide(tweets: DataFrame, stats: DataFrame,
                 mysqlWeekParity: Boolean = false): DataFrame =
    tweets.join(stats, Seq("tweet_id"), "left")
      .withColumn("created_date", to_date(col("created_at")))
      .withColumn("created_year", year(col("created_at")))
      .withColumn("created_month", month(col("created_at")))
      .withColumn("created_day", dayofmonth(col("created_at")))
      .withColumn("created_week",
        if (mysqlWeekParity) graft.functions.MySqlWeek.weekMode1(col("created_at"))
        else weekofyear(col("created_at")))
      .withColumn("created_hour", hour(col("created_at")))

  /** conversations_a / ur_conversations_a: per-conversation rollups with
    * the aggregate side preserved and root-tweet columns joined in
    * (`5_create_conversation_tables.py:30-47`). Root rows can be missing
    * (deleted root tweet) — the rollup row survives with NULL tweet
    * columns, hence the aggregate side stays on the left.
    */
  def conversationRollup(tweets: DataFrame, idCol: String,
                         approxDistinct: Boolean = false): DataFrame = {
    // A7: exact distinct matches the oracle; at 100 TB the opt-in HLL
    // sketch (±2% default rsd) avoids the second exchange the exact
    // two-phase distinct needs (SURVEY §2.5 A7).
    val authors =
      if (approxDistinct) approx_count_distinct(col("author_id")).as("authors")
      else countDistinct(col("author_id")).as("authors")
    val agg = tweets.groupBy(col(idCol).as("conversation_key")).agg(
      count(lit(1)).as("tweets"),
      authors,
      sum(col("reply_count")).as("replies"),
      sum(col("like_count")).as("likes"),
      sum(col("quote_count")).as("quotes_total"),
      sum(col("retweet_count")).as("retweets"))
    val roots = tweets.where(col("tweet_id") === col(idCol))
    agg.join(roots, agg("conversation_key") === roots("tweet_id"), "left")
  }
}
