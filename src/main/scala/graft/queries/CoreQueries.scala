package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Relational operator coverage (SURVEY.md §2.1-§2.7), re-expressed over
  * the driver testdata. Each entry names the SURVEY operator(s) it
  * realizes. All plans are declarative DataFrame code so Catalyst gets
  * pushdown/pruning/join-selection for free; explicit `broadcast()` hints
  * mark the dims that must never shuffle at 100 TB.
  */
object CoreQueries {

  /** cents(x) = exact integer representation of a 2-decimal double. */
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  val all: Seq[(String, Q)] = Seq(

    // ── A3 + J6: conversation rollup ⟖ roots — the flagship spine ──────
    // (5_create_conversation_tables.py:40-47: per-conversation aggregates
    // right-joined onto root tweets, aggregate side preserved)
    "q01_conv_rollup" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val agg = li.groupBy(col("l_orderkey")).agg(
          count(lit(1)).as("n_items"),
          countDistinct(col("l_suppkey")).as("n_suppliers"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("revenue_cents"))
        // aggregate side on the left (big side), roots joined in
        agg.join(Tables.orders(s, dir),
            agg("l_orderkey") === col("o_orderkey"), "left")
          .select(col("l_orderkey"), col("n_items"), col("n_suppliers"),
            col("sum_qty"), col("revenue_cents"), col("o_custkey"),
            col("o_orderstatus"), col("o_orderdate"))
      },
      """SELECT a.l_orderkey, a.n_items, a.n_suppliers, a.sum_qty, a.revenue_cents,
        |       o.o_custkey, o.o_orderstatus, o.o_orderdate
        |FROM (SELECT l_orderkey, count(*) AS n_items,
        |             count(DISTINCT l_suppkey) AS n_suppliers,
        |             sum(l_quantity) AS sum_qty,
        |             cast(sum(cast(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |      FROM lineitem GROUP BY l_orderkey) a
        |LEFT JOIN orders o ON a.l_orderkey = o.o_orderkey""".stripMargin),

    // ── A1: filter + hash aggregate (extract_conversation_ids.py:25-28) ─
    "q02_filter_agg" -> Q(
      (s, dir) => Tables.events(s, dir)
        .where(col("value") > 10)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents")),
      """SELECT user_id, count(*) AS n,
        |       cast(sum(cast(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events WHERE value > 10 GROUP BY user_id""".stripMargin),

    // ── A2: GROUP BY ... HAVING COUNT(*)=1 — singleton conversations ───
    "q03_having_singletons" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
        .where(col("n_items") === 1),
      """SELECT l_orderkey, count(*) AS n_items FROM lineitem
        |GROUP BY l_orderkey HAVING count(*) = 1""".stripMargin),

    // ── A2: HAVING COUNT(*)>1 — multi-tweet conversations ──────────────
    "q04_having_multi" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
        .where(col("n_items") > 1),
      """SELECT l_orderkey, count(*) AS n_items FROM lineitem
        |GROUP BY l_orderkey HAVING count(*) > 1""".stripMargin),

    // ── A7: exact distinct counts ──────────────────────────────────────
    "q05_count_distinct" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_orderkey")).as("n_orders")),
      """SELECT l_partkey, count(DISTINCT l_suppkey) AS n_supp,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_partkey""".stripMargin),

    // ── P7: keyed first-wins dedup via deterministic row_number ────────
    // (INSERT IGNORE contract, 1_initial_load.py:218-224; SURVEY §7.6.2)
    "q06_dedup_firstwins" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("l_partkey"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
        Tables.lineitem(s, dir)
          .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"))
          .withColumn("_rn", row_number().over(w))
          .where(col("_rn") === 1).drop("_rn")
      },
      """SELECT l_partkey, l_orderkey, l_linenumber FROM (
        |  SELECT l_partkey, l_orderkey, l_linenumber,
        |         row_number() OVER (PARTITION BY l_partkey
        |                            ORDER BY l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) WHERE rn = 1""".stripMargin),

    // ── P10: calendar derivations (4_create_tweets_a.py:43,47) ─────────
    // weekofyear is ISO in both engines; exact MySQL WEEK(ts,1) parity
    // is hash-pinned by q223_week_mode1 below (SURVEY §7.6.4)
    "q07_calendar" -> Q(
      (s, dir) => Tables.orders(s, dir).select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("day"),
        weekofyear(col("o_orderdate")).cast("long").as("wk"),
        hour(col("o_orderdate")).cast("long").as("hh")),
      """SELECT o_orderkey, cast(o_orderdate AS DATE) AS d,
        |       year(o_orderdate) AS y, month(o_orderdate) AS m,
        |       day(o_orderdate) AS day, weekofyear(o_orderdate) AS wk,
        |       hour(o_orderdate) AS hh
        |FROM orders""".stripMargin),

    // ── P10 parity: MySQL WEEK(ts, 1) exact semantics (round-15) ───────
    // closes the §7.6.4 calendar deviation: the reference mart stores
    // MariaDB WEEK(created_at, 1) (4_create_tweets_a.py:43) — Monday-
    // first, range 0..53, counted WITHIN the calendar year. The oracle
    // derives the same mapping independently from DuckDB's isoyear():
    // days ISO-assigned to the previous year are week 0, to the next
    // year week 53, else the ISO week. Both emitted so the boundary
    // divergence vs plain weekofyear is hash-pinned, not just asserted
    // in the MySqlWeekSpec sweep.
    "q223_week_mode1" -> Q(
      (s, dir) => {
        val d = to_date(col("o_orderdate"))
        Tables.orders(s, dir).select(
          col("o_orderkey"),
          d.as("d"),
          weekofyear(d).cast("long").as("wk_iso"),
          graft.functions.MySqlWeek.weekMode1(d).cast("long").as("wk_mysql"))
      },
      """SELECT o_orderkey, cast(o_orderdate AS DATE) AS d,
        |       weekofyear(o_orderdate) AS wk_iso,
        |       CASE WHEN isoyear(o_orderdate) < year(o_orderdate) THEN 0
        |            WHEN isoyear(o_orderdate) > year(o_orderdate) THEN 53
        |            ELSE weekofyear(o_orderdate) END AS wk_mysql
        |FROM orders""".stripMargin),

    // ── S1/P1: semi-structured JSON flatten with cast (map_tweet) ──────
    "q08_json_flatten" -> Q(
      (s, dir) => Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("event_type")),
      """SELECT event_id,
        |       cast(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       event_type
        |FROM events""".stripMargin),

    // ── P2/P11/P12: empty-string→NULL, COALESCE, ISNULL predicates ─────
    "q09_null_handling" -> Q(
      (s, dir) => {
        val g = Tables.orders(s, dir).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
        Tables.customer(s, dir)
          .join(g, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"),
            nullif(col("c_mktsegment"), lit("")).as("seg"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            col("o_custkey").isNull.as("no_orders"))
      },
      """SELECT c.c_custkey, nullif(c.c_mktsegment, '') AS seg,
        |       coalesce(g.n_orders, 0) AS n_orders,
        |       g.o_custkey IS NULL AS no_orders
        |FROM customer c LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
        |) g ON c.c_custkey = g.o_custkey""".stripMargin),

    // ── P3: URL-rewrite-style fold: replace each (from,to) pair in text ─
    // (1_initial_load.py:100-113) — higher-order `aggregate` over the
    // rewrite map, codegen-friendly, no UDF
    "q10_text_rewrite" -> Q(
      (s, dir) => {
        val pairs = array(
          struct(lit("data").as("from"), lit("DATA").as("to")),
          struct(lit("spark").as("from"), lit("SPARK").as("to")),
          struct(lit("table").as("from"), lit("relation").as("to")))
        Tables.documents(s, dir).select(
          col("doc_id"),
          aggregate(pairs, col("text"),
            (acc, p) => call_function("replace", acc, p.getField("from"), p.getField("to"))
          ).as("rewritten"))
      },
      """SELECT doc_id,
        |  replace(replace(replace(text, 'data', 'DATA'), 'spark', 'SPARK'),
        |          'table', 'relation') AS rewritten
        |FROM documents""".stripMargin),

    // ── P4 + UDTF-explode: entity extraction → child table + count ─────
    // (explode(entities.hashtags) ≙ token explode, 1_initial_load.py:388-396)
    "q11_token_explode" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n")),
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |) GROUP BY token""".stripMargin),

    // ── P5: referenced-tweet demux — pick element by predicate from an
    // array (element_at(filter(refs, type=...), 1), 1_initial_load.py:121-129)
    "q12_array_demux" -> Q(
      (s, dir) => {
        val toks = split(col("text"), " ")
        Tables.documents(s, dir).select(
          col("doc_id"),
          get(filter(toks, t => t.startsWith("s")), lit(0)).as("first_s"),
          get(filter(toks, t => t.startsWith("q")), lit(0)).as("first_q"))
      },
      """SELECT doc_id,
        |  list_filter(string_split(text, ' '), t -> starts_with(t, 's'))[1] AS first_s,
        |  list_filter(string_split(text, ' '), t -> starts_with(t, 'q'))[1] AS first_q
        |FROM documents""".stripMargin),

    // ── P6: array → length projection (as_tuple, 1_initial_load.py:215) ─
    "q13_array_size" -> Q(
      (s, dir) => Tables.embeddings(s, dir).select(
        col("vec_id"), size(col("embedding")).cast("long").as("dim"),
        col("label").cast("long").as("label")),
      """SELECT vec_id, cast(array_length(embedding) AS BIGINT) AS dim,
        |       cast(label AS BIGINT) AS label
        |FROM embeddings""".stripMargin),

    // ── U1: UNION with set semantics (edge union, 2_enrich...:34) ──────
    "q14_union_distinct" -> Q(
      (s, dir) => {
        val p = Tables.part(s, dir)
        p.where(col("p_size") < 15).select(col("p_brand"))
          .union(p.where(col("p_type").startsWith("STANDARD")).select(col("p_brand")))
          .distinct()
      },
      """SELECT p_brand FROM part WHERE p_size < 15
        |UNION
        |SELECT p_brand FROM part WHERE p_type LIKE 'STANDARD%'""".stripMargin),

    // ── U2: UNION ALL by name (file-list concat, error-row union) ──────
    "q15_union_all" -> Q(
      (s, dir) => {
        val p = Tables.part(s, dir)
        p.where(col("p_size") < 15)
          .select(col("p_partkey"), col("p_brand"), lit("small").as("src"))
          .unionByName(
            p.where(col("p_size") >= 40)
              .select(col("p_partkey"), col("p_brand"), lit("large").as("src")))
      },
      """SELECT p_partkey, p_brand, 'small' AS src FROM part WHERE p_size < 15
        |UNION ALL
        |SELECT p_partkey, p_brand, 'large' AS src FROM part WHERE p_size >= 40""".stripMargin),

    // ── J1/J2: inner equi self-join building parent edges ──────────────
    // (quote/retweet edge extraction, 2_enrich_ur_conversation_ids.py:33-35)
    "q16_self_join_edges" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val ev = Tables.events(s, dir)
        val child = ev
          .withColumn("parent_id", lag(col("event_id"), 1).over(w))
          .where(col("parent_id").isNotNull)
          .select(col("event_id"), col("parent_id"), col("user_id"))
        val parent = ev.select(col("event_id").as("p_id"), col("event_type").as("parent_type"))
        child.join(parent, child("parent_id") === parent("p_id"))
          .select(col("event_id"), col("parent_id"), col("user_id"), col("parent_type"))
      },
      """WITH c AS (
        |  SELECT event_id, user_id,
        |         lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS parent_id
        |  FROM events)
        |SELECT c.event_id, c.parent_id, c.user_id, p.event_type AS parent_type
        |FROM c JOIN events p ON c.parent_id = p.event_id""".stripMargin),

    // ── J5: left outer join USING(key) — wide mart shape ───────────────
    "q17_left_join_enrich" -> Q(
      (s, dir) => {
        val agg = Tables.lineitem(s, dir).groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
        Tables.orders(s, dir)
          .join(agg, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey"), col("o_orderstatus"),
            coalesce(col("n_items"), lit(0L)).as("n_items"),
            coalesce(col("sum_qty"), lit(0.0)).as("sum_qty"))
      },
      """SELECT o.o_orderkey, o.o_orderstatus,
        |       coalesce(a.n_items, 0) AS n_items,
        |       coalesce(a.sum_qty, 0.0) AS sum_qty
        |FROM orders o LEFT JOIN (
        |  SELECT l_orderkey, count(*) AS n_items, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey) a
        |ON o.o_orderkey = a.l_orderkey""".stripMargin),

    // ── J6: right outer join preserving the aggregate side ─────────────
    // (5_create_conversation_tables.py:33-36)
    "q18_right_outer" -> Q(
      (s, dir) => {
        val agg = Tables.lineitem(s, dir).groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_items"))
        Tables.orders(s, dir)
          .join(agg, col("o_orderkey") === col("l_orderkey"), "right")
          .select(col("l_orderkey"), col("n_items"), col("o_orderstatus"))
      },
      """SELECT a.l_orderkey, a.n_items, o.o_orderstatus
        |FROM orders o RIGHT JOIN (
        |  SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY l_orderkey) a
        |ON o.o_orderkey = a.l_orderkey""".stripMargin),

    // ── J7: left semi join (IN-subquery, 3_create_tweet_stats_i.py:349) ─
    "q19_semi_join" -> Q(
      (s, dir) => {
        val singles = Tables.lineitem(s, dir).groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n")).where(col("n") === 1)
        Tables.orders(s, dir)
          .join(singles, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select(col("o_orderkey"), col("o_totalprice"))
      },
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING count(*) = 1)""".stripMargin),

    // ── anti join (complement of J7, SURVEY §2.4 note) ─────────────────
    // Anti-joins against the 'F'-status order subset so the complement is
    // NON-EMPTY at every gate SF (5/71/511 rows at sf0.001/0.01/0.1) — the
    // earlier all-orders form returned 0 rows at sf0.01, so its hash gate
    // could not distinguish a correct anti-join from one dropping everything
    // (VERDICT r15 item 1). The filter rides the probe side pre-join, so the
    // plan is still scan→filter→anti-join: pushdown-eligible at 100 TB.
    "q20_anti_join" -> Q(
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir).where(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name")),
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin),

    // ── J9: broadcast map-join chain over small dims ───────────────────
    // (mentions_id_map resolution, 1_initial_load.py:90,119,329; at 100 TB
    // the dims stay broadcast — no shuffle of the fact table for the join)
    "q21_broadcast_dims" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val su = broadcast(Tables.supplier(s, dir))
        val na = broadcast(Tables.nation(s, dir))
        val re = broadcast(Tables.region(s, dir))
        li.join(su, col("l_suppkey") === col("s_suppkey"))
          .join(na, col("s_nationkey") === col("n_nationkey"))
          .join(re, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_items"),
            sum(cents(col("l_extendedprice"))).as("revenue_cents"))
      },
      """SELECT r.r_name, n.n_name, count(*) AS n_items,
        |       cast(sum(cast(round(l.l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name""".stripMargin),

    // ── J5 + P10 combined: the tweets_a wide-mart shape ────────────────
    // (4_create_tweets_a.py via graft.mart.Mart.tweetsWide: roots ⟕
    // per-key stats + calendar derivations in one pass)
    "q29_wide_mart" -> Q(
      (s, dir) => {
        val roots = Tables.orders(s, dir).select(
          col("o_orderkey").as("tweet_id"),
          col("o_orderstatus"),
          col("o_orderdate").as("created_at"))
        val stats = Tables.lineitem(s, dir).groupBy(col("l_orderkey").as("tweet_id"))
          .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
        graft.mart.Mart.tweetsWide(roots, stats).drop("created_at")
      },
      """SELECT o.o_orderkey AS tweet_id, o.o_orderstatus, a.n_items, a.sum_qty,
        |  cast(o.o_orderdate AS DATE) AS created_date,
        |  cast(year(o.o_orderdate) AS INT) AS created_year,
        |  cast(month(o.o_orderdate) AS INT) AS created_month,
        |  cast(day(o.o_orderdate) AS INT) AS created_day,
        |  cast(weekofyear(o.o_orderdate) AS INT) AS created_week,
        |  cast(hour(o.o_orderdate) AS INT) AS created_hour
        |FROM orders o LEFT JOIN (
        |  SELECT l_orderkey, count(*) AS n_items, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey) a
        |ON o.o_orderkey = a.l_orderkey""".stripMargin),

    // ── O2: deterministic top-k ────────────────────────────────────────
    "q25_topk" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice")),
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),

    // ── W1: window functions (row_number dedup support + running sums) ─
    "q26_window_running" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir).select(
          col("event_id"), col("user_id"),
          row_number().over(w).cast("long").as("rn"),
          sum(cents(col("value")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("run_cents"))
      },
      """SELECT event_id, user_id,
        |  row_number() OVER w AS rn,
        |  cast(sum(cast(round(value*100) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin),

    // ── §2.7 string functions ──────────────────────────────────────────
    "q27_strings" -> Q(
      (s, dir) => Tables.part(s, dir).select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix"),
        length(col("p_name")).cast("long").as("len"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("brandtype"),
        call_function("replace", col("p_type"), lit(" "), lit("_")).as("snake")),
      """SELECT p_partkey, upper(p_name) AS uname, substr(p_name, 1, 5) AS prefix,
        |       cast(length(p_name) AS BIGINT) AS len,
        |       p_brand || '-' || p_type AS brandtype,
        |       replace(p_type, ' ', '_') AS snake
        |FROM part""".stripMargin),

    // ── §2.7 math: abs, zero-guarded division, greatest/least, modulo ──
    "q28_math" -> Q(
      (s, dir) => Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        when(col("l_tax") === 0, 0.0)
          .otherwise(col("l_quantity") / col("l_tax")).as("qty_per_tax"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
        least(col("l_quantity"), col("l_tax") * 100).as("l"),
        (col("l_orderkey") % 7).as("okey_mod")),
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_discount - 0.05) AS disc_dev,
        |       CASE WHEN l_tax = 0 THEN 0.0 ELSE l_quantity / l_tax END AS qty_per_tax,
        |       greatest(l_quantity, l_discount * 100) AS g,
        |       least(l_quantity, l_tax * 100) AS l,
        |       l_orderkey % 7 AS okey_mod
        |FROM lineitem""".stripMargin),
  )
}
