package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.graph.{Closure, PageRank}
import graft.stats.{TreeInput, TreeStats, TreeStatsIterative}
import graft.util.Tables

/** Graph-closure (J3/J4) and tree-statistics (A4/A5/A6/P13) coverage.
  *
  * The tweets domain is re-expressed over the `events` fixture: per-user
  * event chains ordered by (ts, event_id) play the reply/quote tree —
  * `lag(event_id)` is the parent edge; every edge whose child has
  * `event_id % 3 == 0` is a "quote" (ur) edge, the rest are "reply"
  * edges; engagement metrics are deterministic functions of event_id so
  * the DuckDB oracle can derive identical inputs. Chains make every tree
  * statistic window-expressible (see the oracle SQL), while generic
  * branching trees are covered by the ScalaCheck property suite.
  */
object GraphQueries {

  private def chainW = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  /** events → tweet-shaped rows (tweet_id, author_id, parent edges,
    * engagement counts, group/root ids). `dayChains` restarts the chain
    * at each calendar day — MANY SHALLOW trees (the shape real
    * conversation corpora have) instead of one deep chain per user. */
  def eventsAsTweets(s: SparkSession, dir: String,
                     dayChains: Boolean = false): DataFrame = {
    val w = if (dayChains)
      Window.partitionBy(col("user_id"), to_date(col("ts")))
        .orderBy(col("ts"), col("tweet_id"))
    else tweetChainW
    Tables.events(s, dir)
      .select(
        col("event_id").as("tweet_id"),
        (col("event_id") % 10).as("author_id"),
        (col("event_id") % 7).as("reply_count"),
        (col("event_id") % 5).as("quote_count"),
        (col("event_id") % 11).as("like_count"),
        (col("event_id") % 3).as("retweet_count"),
        col("user_id"), col("ts"))
      .withColumn("parent", lag(col("tweet_id"), 1).over(w))
      .withColumn("is_q", col("parent").isNotNull && col("tweet_id") % 3 === 0)
      .withColumn("in_reply_to", when(!col("is_q"), col("parent")))
      .withColumn("quotes", when(col("is_q"), col("parent")))
      .withColumn("retweet_of", lit(null).cast("long"))
  }

  private def tweetChainW = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("tweet_id"))

  /** Shared SQL prelude deriving the same tweet-shaped rows in DuckDB. */
  private val oracleBase =
    """WITH base AS (
      |  SELECT event_id AS tweet_id,
      |         event_id % 10 AS author_id,
      |         event_id % 7 AS reply_count,
      |         event_id % 5 AS quote_count,
      |         event_id % 11 AS like_count,
      |         event_id % 3 AS retweet_count,
      |         user_id,
      |         row_number() OVER w AS idx,
      |         count(*) OVER (PARTITION BY user_id) AS m,
      |         CASE WHEN row_number() OVER w > 1 AND event_id % 3 = 0
      |              THEN 1 ELSE 0 END AS is_q
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), seg AS (
      |  SELECT *, sum(is_q) OVER (PARTITION BY user_id ORDER BY idx) AS seg_id
      |  FROM base
      |), pos AS (
      |  SELECT *,
      |    coalesce(count(*) OVER sseg, 0) AS d_seg,
      |    m - idx AS d_ur
      |  FROM seg
      |  WINDOW sseg AS (PARTITION BY user_id, seg_id ORDER BY idx
      |                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      |), flags AS (
      |  SELECT *,
      |    CASE WHEN d_seg = 0 AND ((is_q = 0 AND idx > 1) OR idx = m)
      |         THEN 1 ELSE 0 END AS is_flag
      |  FROM pos
      |)""".stripMargin

  /** Shared q23/q58 input: tweet-shaped chain rows typed as TreeInput. */
  private def treeInput(s: SparkSession, dir: String,
                        dayChains: Boolean = false): Dataset[TreeInput] = {
    import s.implicits._
    eventsAsTweets(s, dir, dayChains).select(
      col("tweet_id"), col("author_id"), col("in_reply_to"),
      col("retweet_of"), col("quotes"),
      col("reply_count"), col("quote_count"), col("like_count"),
      col("retweet_count"), col("user_id").as("group_id")).as[TreeInput]
  }

  /** The 41-column tree-statistics oracle, shared by q23 (in-memory
    * aggregate) and q58 (relational escape hatch): on chains every
    * formula is window-expressible. */
  private val treeStatsOracle: String = oracleBase +
    """, stats AS (
      |  SELECT *,
      |    coalesce(sum(is_flag) OVER schain, 0) AS ur_leaf,
      |    coalesce(sum(is_flag * idx) OVER schain, 0) AS sum_flag_idx,
      |    sum(reply_count) OVER sseg_incl AS t_reply,
      |    sum(quote_count) OVER sseg_incl AS t_quote,
      |    sum(like_count) OVER sseg_incl AS t_like,
      |    sum(retweet_count) OVER sseg_incl AS t_retweet,
      |    count(DISTINCT author_id) OVER sseg_incl AS t_auth,
      |    sum(reply_count) OVER schain_incl AS ur_t_reply,
      |    sum(quote_count) OVER schain_incl AS ur_t_quote,
      |    sum(like_count) OVER schain_incl AS ur_t_like,
      |    sum(retweet_count) OVER schain_incl AS ur_t_retweet,
      |    count(DISTINCT author_id) OVER schain_incl AS ur_t_auth,
      |    lead(reply_count) OVER wc AS nx_reply,
      |    lead(quote_count) OVER wc AS nx_quote,
      |    lead(like_count) OVER wc AS nx_like,
      |    lead(retweet_count) OVER wc AS nx_retweet,
      |    lead(d_seg) OVER wc AS nx_d_seg
      |  FROM flags
      |  WINDOW
      |    wc AS (PARTITION BY user_id ORDER BY idx),
      |    schain AS (PARTITION BY user_id ORDER BY idx
      |               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
      |    schain_incl AS (PARTITION BY user_id ORDER BY idx
      |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
      |    sseg_incl AS (PARTITION BY user_id, seg_id ORDER BY idx
      |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |)
      |SELECT
      |  tweet_id,
      |  cast(CASE WHEN d_seg > 0 THEN 1 ELSE 0 END AS BIGINT) AS children,
      |  cast(CASE WHEN d_ur > 0 THEN 1 ELSE 0 END AS BIGINT) AS ur_children,
      |  cast(d_seg AS BIGINT) AS descendants,
      |  cast(d_ur AS BIGINT) AS ur_descendants,
      |  cast(CASE WHEN d_seg > 0 THEN 1 ELSE 0 END AS BIGINT) AS leaf_descendants,
      |  cast(ur_leaf AS BIGINT) AS ur_leaf_descendants,
      |  cast(d_seg AS BIGINT) AS max_depth,
      |  cast(d_ur AS BIGINT) AS ur_max_depth,
      |  cast(t_auth AS BIGINT) AS t_authors,
      |  cast(ur_t_auth AS BIGINT) AS ur_t_authors,
      |  cast(t_reply AS BIGINT) AS t_reply_count,
      |  cast(ur_t_reply AS BIGINT) AS ur_t_reply_count,
      |  cast(t_quote AS BIGINT) AS t_quote_count,
      |  cast(ur_t_quote AS BIGINT) AS ur_t_quote_count,
      |  cast(t_like AS BIGINT) AS t_like_count,
      |  cast(ur_t_like AS BIGINT) AS ur_t_like_count,
      |  cast(t_retweet AS BIGINT) AS t_retweet_count,
      |  cast(ur_t_retweet AS BIGINT) AS ur_t_retweet_count,
      |  d_seg / (1.0 + d_seg - CASE WHEN d_seg > 0 THEN 1 ELSE 0 END) AS branching_factor,
      |  d_ur / (1.0 + d_ur - ur_leaf) AS ur_branching_factor,
      |  CASE WHEN d_seg > 0 THEN cast(d_seg - 1 AS DOUBLE) ELSE 0.0 END AS mean_depth,
      |  CASE WHEN ur_leaf > 0
      |       THEN cast(sum_flag_idx - ur_leaf * (idx + 1) AS DOUBLE) / ur_leaf
      |       ELSE 0.0 END AS ur_mean_depth,
      |  0.0 AS depth_mad,
      |  CASE WHEN d_ur > 0
      |       THEN abs(cast(sum_flag_idx - ur_leaf * (idx + 1) AS DOUBLE) / ur_leaf
      |                - nx_d_seg)
      |       ELSE 0.0 END AS ur_depth_mad,
      |  t_reply / (d_seg + 1.0) AS mean_reply_count,
      |  ur_t_reply / (d_ur + 1.0) AS ur_mean_reply_count,
      |  (abs(reply_count - t_reply / (d_seg + 1.0))
      |   + CASE WHEN d_seg > 0 THEN abs(nx_reply - t_reply / (d_seg + 1.0)) ELSE 0.0 END)
      |    / (d_seg + 1.0) AS reply_count_mad,
      |  (abs(reply_count - ur_t_reply / (d_ur + 1.0))
      |   + CASE WHEN d_ur > 0 THEN abs(nx_reply - ur_t_reply / (d_ur + 1.0)) ELSE 0.0 END)
      |    / (d_ur + 1.0) AS ur_reply_count_mad,
      |  t_quote / (d_seg + 1.0) AS mean_quote_count,
      |  ur_t_quote / (d_ur + 1.0) AS ur_mean_quote_count,
      |  (abs(quote_count - t_quote / (d_seg + 1.0))
      |   + CASE WHEN d_seg > 0 THEN abs(nx_quote - t_quote / (d_seg + 1.0)) ELSE 0.0 END)
      |    / (d_seg + 1.0) AS quote_count_mad,
      |  (abs(quote_count - ur_t_quote / (d_ur + 1.0))
      |   + CASE WHEN d_ur > 0 THEN abs(nx_quote - ur_t_quote / (d_ur + 1.0)) ELSE 0.0 END)
      |    / (d_ur + 1.0) AS ur_quote_count_mad,
      |  t_like / (d_seg + 1.0) AS mean_like_count,
      |  ur_t_like / (d_ur + 1.0) AS ur_mean_like_count,
      |  (abs(like_count - t_like / (d_seg + 1.0))
      |   + CASE WHEN d_seg > 0 THEN abs(nx_like - t_like / (d_seg + 1.0)) ELSE 0.0 END)
      |    / (d_seg + 1.0) AS like_count_mad,
      |  (abs(like_count - ur_t_like / (d_ur + 1.0))
      |   + CASE WHEN d_ur > 0 THEN abs(nx_like - ur_t_like / (d_ur + 1.0)) ELSE 0.0 END)
      |    / (d_ur + 1.0) AS ur_like_count_mad,
      |  t_retweet / (d_seg + 1.0) AS mean_retweet_count,
      |  ur_t_retweet / (d_ur + 1.0) AS ur_mean_retweet_count,
      |  (abs(retweet_count - t_retweet / (d_seg + 1.0))
      |   + CASE WHEN d_seg > 0 THEN abs(nx_retweet - t_retweet / (d_seg + 1.0)) ELSE 0.0 END)
      |    / (d_seg + 1.0) AS retweet_count_mad,
      |  (abs(retweet_count - ur_t_retweet / (d_ur + 1.0))
      |   + CASE WHEN d_ur > 0 THEN abs(nx_retweet - ur_t_retweet / (d_ur + 1.0)) ELSE 0.0 END)
      |    / (d_ur + 1.0) AS ur_retweet_count_mad
      |FROM stats""".stripMargin

  /** [[treeStatsOracle]] with the chain partition key extended by the
    * calendar day — the SAME generated formulas over per-(user, day)
    * chains, q58's wide/shallow fixture. Transforming the shared oracle
    * string keeps the two shapes drift-free by construction: every
    * `PARTITION BY user_id[, seg_id]` gains `, dt`. */
  private val treeStatsOracleDay: String =
    treeStatsOracle
      .replace("FROM events", "FROM (SELECT *, CAST(ts AS DATE) AS dt FROM events)")
      .replace("user_id,\n", "user_id, dt,\n")
      .replace("PARTITION BY user_id", "PARTITION BY user_id, dt")

  /** q65 oracle: the exact-integer PageRank recurrence unrolled to
    * `iters` CTEs, generated from the SAME constants the engine uses
    * (same anti-drift design as the k-means oracle). `//` is DuckDB
    * floor division — identical to Spark's `div` on the non-negative
    * operands here; sums of BIGINT (DuckDB HUGEINT) are cast back.
    */
  private def pageRankOracleSql(iters: Int, scale: Long,
                                dampNum: Long, dampDen: Long): String = {
    val base = scale * (dampDen - dampNum) / dampDen
    val head =
      s"""WITH edges AS (
         |  SELECT parent AS src, event_id AS dst FROM (
         |    SELECT event_id,
         |           lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS parent
         |    FROM events)
         |  WHERE parent IS NOT NULL),
         |nodes AS (SELECT DISTINCT src AS id FROM edges
         |          UNION SELECT DISTINCT dst FROM edges),
         |outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
         |r0 AS (SELECT id, cast($scale AS BIGINT) AS r FROM nodes)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s""",
         |r$i AS (
         |  SELECT n.id,
         |         cast($base + coalesce(sum((r.r * $dampNum) // ($dampDen * o.od)), 0) AS BIGINT) AS r
         |  FROM nodes n
         |  LEFT JOIN edges e ON e.dst = n.id
         |  LEFT JOIN r${i - 1} r ON r.id = e.src
         |  LEFT JOIN outdeg o ON o.src = e.src
         |  GROUP BY n.id)""".stripMargin
    }.mkString
    head + iterCtes + s"\nSELECT id AS event_id, r AS rank_scaled FROM r$iters"
  }

  /** q93 oracle: the q65 recurrence amended with textbook sink-mass
    * redistribution — per iteration, D = Σ r over nodes with no
    * out-edge, and every node additionally receives
    * (D·dampNum) // (dampDen·N). Generated from the same constants. */
  private def pageRankDanglingOracleSql(iters: Int, scale: Long,
                                        dampNum: Long, dampDen: Long): String = {
    val base = scale * (dampDen - dampNum) / dampDen
    val head =
      s"""WITH edges AS (
         |  SELECT parent AS src, event_id AS dst FROM (
         |    SELECT event_id,
         |           lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS parent
         |    FROM events)
         |  WHERE parent IS NOT NULL),
         |nodes AS (SELECT DISTINCT src AS id FROM edges
         |          UNION SELECT DISTINCT dst FROM edges),
         |outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
         |dang AS (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM edges)),
         |r0 AS (SELECT id, cast($scale AS BIGINT) AS r FROM nodes)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s""",
         |d$i AS (SELECT coalesce(sum(r), 0) AS dm FROM r${i - 1}
         |        WHERE id IN (SELECT id FROM dang)),
         |r$i AS (
         |  SELECT n.id,
         |         cast($base + coalesce(sum((r.r * $dampNum) // ($dampDen * o.od)), 0)
         |              + (SELECT (dm * $dampNum) // ($dampDen * (SELECT count(*) FROM nodes))
         |                 FROM d$i) AS BIGINT) AS r
         |  FROM nodes n
         |  LEFT JOIN edges e ON e.dst = n.id
         |  LEFT JOIN r${i - 1} r ON r.id = e.src
         |  LEFT JOIN outdeg o ON o.src = e.src
         |  GROUP BY n.id)""".stripMargin
    }.mkString
    head + iterCtes + s"\nSELECT id AS event_id, r AS rank_scaled FROM r$iters"
  }

  val all: Seq[(String, Q)] = Seq(

    // ── J3/J4: iterative closure to forest roots (pointer jumping) ─────
    // (2_enrich_ur_conversation_ids.py:39-52). Oracle: on chains the root
    // is simply the first event of the user — the Spark side still runs
    // the real O(log depth) iterative-join fixpoint.
    "q22_closure" -> Q(
      (s, dir) => {
        val edges = Tables.events(s, dir)
          .withColumn("parent", lag(col("event_id"), 1).over(chainW))
          .where(col("parent").isNotNull)
          .select(col("event_id").as("id"), col("parent"))
        Closure.resolveRoots(edges)
          .select(col("id").as("event_id"), col("root").as("root_id"))
      },
      """SELECT event_id, root_id FROM (
        |  SELECT event_id,
        |         first_value(event_id) OVER w AS root_id,
        |         row_number() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |) WHERE rn > 1""".stripMargin),

    // ── INCREMENTAL closure maintenance (continuous-crawl contract) ────
    // q22 recomputes the root map from scratch; a continuous crawl must
    // fold each batch's edges in O(batch): the settled graph = all but
    // each user's LAST TWO events (the append frontier — children
    // arrive after parents, so the split is the arrival order), the
    // batch resolves internally (batch-sized joins only) and takes ONE
    // probe join against the settled map (Closure.addEdges; PlanSpec
    // pins the probe count). The oracle is q22's full-graph closure
    // VERBATIM — the driver proves incremental == full recompute,
    // hash-equal.
    "q180_closure_add" -> Q(
      (s, dir) => {
        val chainWDesc = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        val edges = Tables.events(s, dir)
          .withColumn("parent", lag(col("event_id"), 1).over(chainW))
          .withColumn("rrev", row_number().over(chainWDesc))
          .where(col("parent").isNotNull)
        // NOT checkpointed: both splits re-derive the two window stages,
        // but measured (r9, q22/q31-controlled min-of-3) the recompute is
        // cheaper than eagerly materializing the full edge relation
        val old = edges.where(col("rrev") > 2)
          .select(col("event_id").as("id"), col("parent"))
        val batch = edges.where(col("rrev") <= 2)
          .select(col("event_id").as("id"), col("parent"))
        Closure.addEdges(Closure.resolveRoots(old), batch)
          .select(col("id").as("event_id"), col("root").as("root_id"))
      },
      """SELECT event_id, root_id FROM (
        |  SELECT event_id,
        |         first_value(event_id) OVER w AS root_id,
        |         row_number() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |) WHERE rn > 1""".stripMargin),

    // ── PRODUCTION delta path: maintenance against a PERSISTED store ───
    // q180 derives the settled side in-query so the full-recompute
    // oracle can gate it — a verification shape whose bench row prices
    // an upper bound. This query prices what a DEPLOYMENT runs per
    // batch: the settled root map and the batch edges are session
    // artifacts (built once in-query — the first pass still pays and
    // verifies the whole derivation; SessionStore's scaladoc is the
    // pricing contract), and the registered plan is Closure.addEdges
    // against the persisted relation alone — the settled parquet is
    // scanned exactly twice (probe + union pass-through; PlanSpec pins
    // it along with broadcast-only batch joins), never shuffled, never
    // re-resolved. The oracle stays q180's full-graph closure VERBATIM,
    // so the driver proves the upserted store (settled ∪ delta) equals
    // the full recompute, hash-equal.
    "q191_closure_delta" -> Q(
      (s, dir) => {
        val store = graft.util.SessionStore.getOrBuild(
          s"closure|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
          "closure") { p =>
          val chainWDesc = Window.partitionBy(col("user_id"))
            .orderBy(col("ts").desc, col("event_id").desc)
          val edges = Tables.events(s, dir)
            .withColumn("parent", lag(col("event_id"), 1).over(chainW))
            .withColumn("rrev", row_number().over(chainWDesc))
            .where(col("parent").isNotNull)
            .localCheckpoint(true)
          Closure.resolveRoots(edges.where(col("rrev") > 2)
              .select(col("event_id").as("id"), col("parent")))
            .write.parquet(s"$p/settled")
          edges.where(col("rrev") <= 2)
            .select(col("event_id").as("id"), col("parent"))
            .write.parquet(s"$p/batch")
        }
        Closure.addEdges(s.read.parquet(s"$store/settled"),
            s.read.parquet(s"$store/batch"))
          .select(col("id").as("event_id"), col("root").as("root_id"))
      },
      """SELECT event_id, root_id FROM (
        |  SELECT event_id,
        |         first_value(event_id) OVER w AS root_id,
        |         row_number() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |) WHERE rn > 1""".stripMargin),

    // ── graph centrality: exact-integer damped PageRank ────────────────
    // Same per-user chain edges as q22; the engine runs the generic
    // iterative join/aggregate loop, the oracle replays the identical
    // integer recurrence unrolled (generated from the same constants).
    "q65_pagerank" -> Q(
      (s, dir) => {
        val edges = Tables.events(s, dir)
          .withColumn("parent", lag(col("event_id"), 1).over(chainW))
          .where(col("parent").isNotNull)
          .select(col("parent").as("src"), col("event_id").as("dst"))
        PageRank.run(edges, iters = 3)
          .select(col("id").as("event_id"), col("r").as("rank_scaled"))
      },
      pageRankOracleSql(iters = 3, scale = 1000000L, dampNum = 17L, dampDen = 20L)),

    // ── PageRank with sink-mass redistribution ─────────────────────────
    // Same chain edges; every chain tail is a sink, so the redistributed
    // share is live from round 1. The oracle unrolls the amended
    // recurrence (per-round sink-mass CTE + uniform integer share).
    "q93_pagerank_dangling" -> Q(
      (s, dir) => {
        val edges = Tables.events(s, dir)
          .withColumn("parent", lag(col("event_id"), 1).over(chainW))
          .where(col("parent").isNotNull)
          .select(col("parent").as("src"), col("event_id").as("dst"))
        PageRank.run(edges, iters = 3, redistributeDangling = true)
          .select(col("id").as("event_id"), col("r").as("rank_scaled"))
      },
      pageRankDanglingOracleSql(iters = 3, scale = 1000000L, dampNum = 17L, dampDen = 20L)),

    // ── A4/A5/A6: the full 41-column per-tweet tree statistics ─────────
    // (3_create_tweet_stats_i.py) via groupByKey+flatMapGroups; the chain
    // instance makes every formula window-expressible for the oracle.
    "q23_tree_stats" -> Q(
      (s, dir) => TreeStats.compute(treeInput(s, dir)).toDF(),
      treeStatsOracle),

    // ── A4 escape hatch: same 41 columns via the relational formulation
    // (pointer-doubled path pairs + shuffled aggregates — the bounded-
    // task-memory path for mega-conversations). Fixture is the
    // WIDE/SHALLOW per-(user, day) chain shape — the formulation's
    // actual production target (pair volume O(nodes × avg depth)); the
    // deep-chain pathology it deliberately does NOT optimize for stays
    // proven by the TreeStatsIterativeSpec chain cross-checks. Oracle is
    // the q23 oracle with the day folded into the partition key — same
    // generated formulas, so the two formulations still can't drift.
    "q58_tree_stats_iterative" -> Q(
      (s, dir) => TreeStatsIterative.compute(treeInput(s, dir, dayChains = true)).toDF(),
      treeStatsOracleDay),

    // ── A4 cluster-scale arm (VERDICT r16 item 2): the SAME relational
    // formulation with broadcast joins disabled, so the doubling join
    // executes the sort-merge shape a 100 TB run takes past the
    // broadcast threshold (the adjudicated SCALEPROBE_r16b 10× sig
    // mismatch). Same fixture, same generated oracle as q58 — the two
    // rows differ ONLY in physical join strategy, which is exactly what
    // this row exists to hash-gate. Registry-growth note: no new store;
    // this is a priced reference arm over the shared q23/q58 input.
    "q228_tree_stats_smj" -> Q(
      (s, dir) => TreeStatsIterative.computeSortMerge(
        treeInput(s, dir, dayChains = true)).toDF(),
      treeStatsOracleDay),


    // ── P13: singleton constant-projection fast path ───────────────────
    // (3_create_tweet_stats_i.py:304-352). Grouping here is per
    // (user, day) — per-user groups have no singletons in the fixture —
    // with the group root (= first event of the user-day) as group id.
    "q24_singleton_fastpath" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"), col("day"))
          .orderBy(col("ts"), col("tweet_id"))
        val tweets = eventsAsTweets(s, dir)
          .withColumn("day", to_date(col("ts")))
          .withColumn("group_id", first(col("tweet_id")).over(w))
        TreeStats.singletonStats(tweets)
      },
      """WITH base AS (
        |  SELECT event_id AS tweet_id,
        |         event_id % 7 AS reply_count,
        |         event_id % 5 AS quote_count,
        |         event_id % 11 AS like_count,
        |         event_id % 3 AS retweet_count,
        |         count(*) OVER (PARTITION BY user_id, date_trunc('day', ts)) AS gm
        |  FROM events
        |)""".stripMargin +
        """SELECT
          |  tweet_id,
          |  cast(0 AS BIGINT) AS children, cast(0 AS BIGINT) AS ur_children,
          |  cast(0 AS BIGINT) AS descendants, cast(0 AS BIGINT) AS ur_descendants,
          |  cast(0 AS BIGINT) AS leaf_descendants, cast(0 AS BIGINT) AS ur_leaf_descendants,
          |  cast(0 AS BIGINT) AS max_depth, cast(0 AS BIGINT) AS ur_max_depth,
          |  cast(1 AS BIGINT) AS t_authors, cast(1 AS BIGINT) AS ur_t_authors,
          |  cast(reply_count AS BIGINT) AS t_reply_count,
          |  cast(reply_count AS BIGINT) AS ur_t_reply_count,
          |  cast(quote_count AS BIGINT) AS t_quote_count,
          |  cast(quote_count AS BIGINT) AS ur_t_quote_count,
          |  cast(like_count AS BIGINT) AS t_like_count,
          |  cast(like_count AS BIGINT) AS ur_t_like_count,
          |  cast(retweet_count AS BIGINT) AS t_retweet_count,
          |  cast(retweet_count AS BIGINT) AS ur_t_retweet_count,
          |  0.0 AS branching_factor, 0.0 AS ur_branching_factor,
          |  0.0 AS mean_depth, 0.0 AS ur_mean_depth,
          |  0.0 AS depth_mad, 0.0 AS ur_depth_mad,
          |  cast(reply_count AS DOUBLE) AS mean_reply_count,
          |  cast(reply_count AS DOUBLE) AS ur_mean_reply_count,
          |  0.0 AS reply_count_mad, 0.0 AS ur_reply_count_mad,
          |  cast(quote_count AS DOUBLE) AS mean_quote_count,
          |  cast(quote_count AS DOUBLE) AS ur_mean_quote_count,
          |  0.0 AS quote_count_mad, 0.0 AS ur_quote_count_mad,
          |  cast(like_count AS DOUBLE) AS mean_like_count,
          |  cast(like_count AS DOUBLE) AS ur_mean_like_count,
          |  0.0 AS like_count_mad, 0.0 AS ur_like_count_mad,
          |  cast(retweet_count AS DOUBLE) AS mean_retweet_count,
          |  cast(retweet_count AS DOUBLE) AS ur_mean_retweet_count,
          |  0.0 AS retweet_count_mad, 0.0 AS ur_retweet_count_mad
          |FROM base WHERE gm = 1""".stripMargin),
  )
}
