package graft.queries

import org.apache.spark.sql.functions.{coalesce, col, concat, count, countDistinct, explode, length, lit, size, split, sum, transform, when}

import graft.ext.{Dedup, EventWindows, KMeans, Multimodal, Prep, RangeJoin, Sampling, SeqPack, Similarity, TextAnalysis}
import graft.streaming.StreamIngest
import graft.util.Tables

/** LLM-data-pipeline extension coverage (SURVEY §7.5): dedup family,
  * similarity search, text analysis, multimodal columns, event-time
  * windows. Oracle SQL fragments that depend on shared constants
  * (minhash k, simhash bits, fingerprint powers, marker words) are
  * GENERATED from the same Scala values the engine uses, so the two
  * sides cannot drift.
  */
object ExtQueries {

  /** hash64 in DuckDB: first 15 md5 hex chars as a 60-bit integer. */
  private def sqlHash64(e: String): String =
    s"cast(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** Shared-span CTE chain (TextAnalysis.sharedSpans' oracle): token
    * grams → df cap → positioned self-join → diagonal gaps-and-islands →
    * maximal spans. Ends with `toks` (doc_id, t) and `spans`
    * (doc_a, doc_b, start_a, start_b, len_tokens) in scope — q107
    * SELECTs spans directly, q113 chains the cut arithmetic on top. */
  private def sharedSpansCtes(k: Int,
                              maxDf: Int = Dedup.DefaultMaxShingleDf): String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |grams AS (SELECT doc_id, i - 1 AS pos,
       |    ${sqlHash64(s"array_to_string(t[i:i+${k - 1}], ' ')")} AS gh
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - $k + 2)) AS i
       |        FROM toks WHERE len(t) >= $k)),
       |cold AS (SELECT * FROM grams WHERE gh IN
       |  (SELECT gh FROM grams GROUP BY gh
       |   HAVING count(DISTINCT doc_id) <= $maxDf)),
       |hits AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.pos AS pos_a, b.pos AS pos_b
       |  FROM cold a JOIN cold b USING (gh) WHERE a.doc_id < b.doc_id),
       |isl AS (SELECT *, pos_a - pos_b AS diag,
       |    pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, pos_a - pos_b
       |                               ORDER BY pos_a) AS island
       |  FROM hits),
       |spans AS (SELECT doc_a, doc_b, cast(min(pos_a) AS BIGINT) AS start_a,
       |  cast(min(pos_b) AS BIGINT) AS start_b,
       |  cast(max(pos_a) - min(pos_a) + $k AS BIGINT) AS len_tokens
       |FROM isl GROUP BY doc_a, doc_b, diag, island)""".stripMargin

  private val shingleBase5 =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS sh
      |       FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t)-3, 1))) AS i FROM toks))
      |""".stripMargin

  private val shingleBase3 =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS sh
      |       FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t)-1, 1))) AS i FROM toks))
      |""".stripMargin

  /** Capped-candidate + exact-rescore pair CTEs (continuation of a
    * shingle base): mirrors `Dedup.ngramJaccardPairs` with the stop-
    * shingle cap taken from the engine's own constant. */
  private val cappedJaccardPairsSql =
    s""", cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |cold AS (SELECT doc_id, sh FROM sh
       |         WHERE sh IN (SELECT sh FROM sh GROUP BY sh
       |                      HAVING count(*) <= ${Dedup.DefaultMaxShingleDf})),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM cold a JOIN cold b USING (sh) WHERE a.doc_id < b.doc_id),
       |pairs AS (SELECT doc_a, doc_b, count(*) AS inter
       |          FROM cand
       |          JOIN sh sa ON sa.doc_id = doc_a
       |          JOIN sh sb ON sb.doc_id = doc_b AND sb.sh = sa.sh
       |          GROUP BY 1, 2)
       |""".stripMargin

  /** Decontamination oracle (eval = every 97th doc, 3-gram shingles) —
    * shared by the broadcast-dictionary path (q54) and the bloom path
    * (q61), which must agree exactly. */
  private val decontaminateSql = shingleBase3 +
    """, ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
      |contam AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (sh))
      |SELECT doc_id, lang FROM documents
      |WHERE doc_id NOT IN (SELECT doc_id FROM contam)""".stripMargin

  /** Brute-force cosine top-k (nQueries=8, k=5) — the oracle for the
    * exact baseline (q35) and the int8-rescored path (q59). */
  private val annTopKSql =
    """WITH e AS (SELECT vec_id, q FROM (SELECT vec_id,
      |    list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
      |    FROM embeddings) WHERE list_dot_product(q, q) > 0),
      |scored AS (
      |  SELECT qs.vec_id AS q_id, e.vec_id,
      |    list_dot_product(qs.q, e.q)
      |      / (sqrt(list_dot_product(qs.q, qs.q)) * sqrt(list_dot_product(e.q, e.q))) AS cos
      |  FROM e qs JOIN e ON qs.vec_id < 8 AND e.vec_id != qs.vec_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT q_id, vec_id, cos, cast(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 5""".stripMargin

  /** Brute-force quantized cosine pairs at tau=0.40 — the oracle for
    * BOTH the exact baseline (q34) and the LSH-pruned path (q46). */
  private val cosineAllPairsSql =
    """WITH e AS (SELECT vec_id,
      |  list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
      |  FROM embeddings)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  list_dot_product(a.q, b.q)
      |    / (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))) AS cos
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE list_dot_product(a.q, b.q)
      |    / (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))) >= 0.40""".stripMargin

  /** q52 per-language keep rates: downsample over-represented English,
    * keep the long tail (unlisted strata fall back to the default). */
  /** Data-mixing token budgets (q117 + q108's final stage): per-domain
    * token targets with a default for unlisted domains — sized so the
    * cut bites on the fixture (en/de/fr run over, es/zh stay whole). */
  private val MixBudgets: Seq[(String, Long)] = Seq("en" -> 2500L)
  private val MixDefaultBudget = 2000L

  /** q123's target mixing proportions as integer weights (5:3:2
    * en:de:zh); fr/es are unlisted, so the recipe drops them — and the
    * binding domain differs from the largest one on the fixture, so the
    * water-filling optimization is actually exercised. */
  private val MixWeights: Seq[(String, Long)] = Seq("en" -> 5L, "de" -> 3L, "zh" -> 2L)

  /** q143 quality-tier token budgets (high-affinity docs get the bulk
    * of the budget; thresholds sit inside the fixture's affinity
    * distribution so every tier's cut actually bites). */
  private val QualityBudgets: Seq[(String, Long)] = Seq("high" -> 5000L, "mid" -> 2500L)
  private val QualityDefaultBudget = 1000L

  // ── quality-gate SQL fragments (q108 + q122 shared), generated from
  //    the SAME Scala constants the engine reads ───────────────────────
  /** Per-language marker-score select list (`..., sc_en, sc_de, ...`). */
  private lazy val langScoresSql: String = {
    def occ(w: String) =
      s"((length(text) - length(replace(text, '$w', ''))) / ${w.length})"
    TextAnalysis.LangMarkers.map { case (lang, ws) =>
      s"${ws.map(occ).mkString(" + ")} AS sc_$lang"
    }.mkString(", ")
  }
  /** The argmax CASE fold over the score columns (strict >, first-listed
    * language wins ties — mirrors TextAnalysis.langGuessExpr). */
  private lazy val langGuessCaseSql: String = {
    val langs = TextAnalysis.LangMarkers.map(_._1)
    langs.tail.foldLeft((s"'${langs.head}'", s"sc_${langs.head}")) {
      case ((bl, bs), lang) =>
        (s"(CASE WHEN sc_$lang > $bs THEN '$lang' ELSE $bl END)",
          s"greatest($bs, sc_$lang)")
    }._1
  }
  /** Stopword-occurrence sum over token array `t` (quality score). */
  private lazy val stopSumSql: String = TextAnalysis.Stopwords
    .map(w => s"len(list_filter(t, x -> x = '$w'))").mkString(" + ")

  private val StratRates: Seq[(String, Int)] =
    Seq("en" -> 40, "de" -> 80, "fr" -> 90, "zh" -> 60)

  /** Cleaning-pipeline oracle (lang-consistency ∧ min-length ∧
    * low-repetition ∧ decontaminated) — shared by the composed form
    * (q74) and the fused single-scan form (q91), which must agree. */
  private lazy val cleanPipelineSql: String = {
    def occ(w: String) =
      s"((length(text) - length(replace(text, '$w', ''))) / ${w.length})"
    val scores = TextAnalysis.LangMarkers.map { case (lang, ws) =>
      s"${ws.map(occ).mkString(" + ")} AS sc_$lang"
    }.mkString(", ")
    val langs = TextAnalysis.LangMarkers.map(_._1)
    val guess = langs.tail.foldLeft((s"'${langs.head}'", s"sc_${langs.head}")) {
      case ((bl, bs), lang) =>
        (s"(CASE WHEN sc_$lang > $bs THEN '$lang' ELSE $bl END)",
          s"greatest($bs, sc_$lang)")
    }._1
    shingleBase3 +
      s""", ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
         |contam AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (sh)),
         |langok AS (SELECT doc_id FROM
         |  (SELECT doc_id, lang, text, $scores FROM documents)
         |  WHERE $guess = lang),
         |longok AS (SELECT doc_id FROM documents
         |           WHERE len(string_split(text, ' ')) >= 25),
         |reps AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS rep_ratio FROM
         |  (SELECT doc_id, g, count(*) AS c FROM
         |    (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
         |     FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
         |           FROM (SELECT doc_id, string_split(text, ' ') AS t
         |                 FROM documents) WHERE len(t) >= 2))
         |   GROUP BY 1, 2) GROUP BY doc_id),
         |repok AS (SELECT doc_id FROM reps WHERE rep_ratio < 0.05)
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM contam)
         |  AND doc_id IN (SELECT doc_id FROM langok)
         |  AND doc_id IN (SELECT doc_id FROM longok)
         |  AND doc_id IN (SELECT doc_id FROM repok)""".stripMargin
  }

  /** q73's oracle — shared verbatim by q134 (the persisted-index
    * variant must be semantically invisible, so the SAME SQL gates
    * both). */
  private lazy val dedupIncrementalSql: String =
    shingleBase3 + minhashBandsSql +
      """, newdocs AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 7 = 3),
        |corphash AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 7 <> 3),
        |exact_kept AS (SELECT doc_id, lang FROM newdocs
        |               WHERE md5(text) NOT IN (SELECT h FROM corphash)),
        |coll AS (SELECT DISTINCT a.doc_id FROM bands a JOIN bands b USING (band, m0, m1)
        |         WHERE a.doc_id % 7 = 3 AND b.doc_id % 7 <> 3)
        |SELECT doc_id, lang FROM exact_kept
        |WHERE doc_id NOT IN (SELECT doc_id FROM coll)""".stripMargin

  /** q120's verified fuzzy-cluster chain (minhash candidates → exact
    * Jaccard verify on candidates only → connected components →
    * longest-text survivor), shared by q120 and the leak-free split
    * q135 — ONE implementation, two gates. */
  private def fuzzyClusters(s: org.apache.spark.sql.SparkSession,
                            dir: String): org.apache.spark.sql.DataFrame = {
    // round-12: the minhash→verify→CC chain materializes once per
    // (fixture, session) — q120, q135 and the q147 cascade share one
    // clustering run (the sessionCluster discipline semanticClusters
    // already follows; the registered incremental surface, q181, is
    // how a deployment keeps this store current between rebuilds)
    val store = graft.util.SessionStore.getOrBuild(
      s"fuzzyclus|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
      "fuzzyclus") { p =>
      val docs = Tables.documents(s, dir)
      val cand = Dedup.minhashCandidates(docs, n = 3)
        .select(col("doc_a"), col("doc_b"))
      val verified = Dedup.jaccardVerifyPairs(docs, cand, n = 3, tau = 0.5)
      Dedup.clusterPairsBy(docs,
        verified.select(col("doc_a").as("a"), col("doc_b").as("b")),
        length(col("text")))
        .write.parquet(s"$p/clusters")
    }
    s.read.parquet(s"$store/clusters")
  }

  /** q45's n-gram Jaccard clustering (n = 5, tau = 0.5) materialized
    * once per (fixture, session) — round-16: q57 and q160 each re-ran
    * the full pairs→CC chain (~40 MB shuffle, ~30 jobs apiece per
    * bench pass) to answer questions that are pure transforms of the
    * SAME labeling. They now read this store (the [[fuzzyClusters]]
    * discipline applied to the n=5 chain); q45 itself stays LIVE as
    * the priced one-shot reference arm, and q181 keeps its
    * by-construction full derivation (its oracle proves incremental ==
    * full). */
  private def jaccard5Clusters(s: org.apache.spark.sql.SparkSession,
                               dir: String): org.apache.spark.sql.DataFrame = {
    val store = graft.util.SessionStore.getOrBuild(
      s"jacclus5|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
      "jacclus5") { p =>
      Dedup.nearDupClusters(Tables.documents(s, dir), n = 5, tau = 0.5)
        .write.parquet(s"$p/clusters")
    }
    s.read.parquet(s"$store/clusters")
  }

  /** q107's maximal shared spans (k = 8) materialized once per
    * (fixture, session) — q113's rewrite consumes them without
    * re-mining (round-16). q107 stays LIVE as the priced mining arm. */
  private def sharedSpans8(s: org.apache.spark.sql.SparkSession,
                           dir: String): org.apache.spark.sql.DataFrame = {
    val store = graft.util.SessionStore.getOrBuild(
      s"spans8|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
      "spans8") { p =>
      TextAnalysis.sharedSpans(Tables.documents(s, dir), k = 8)
        .write.parquet(s"$p/spans")
    }
    s.read.parquet(s"$store/spans")
  }

  /** [[fuzzyClusters]]' oracle CTE chain — ends with `lab(doc_id, cl,
    * q)`, `surv(cl, canonical_id)`, `sizes(cl, cluster_size)` in
    * scope; q120 emits the rewritten corpus from it, q135 the
    * cluster-keyed split. */
  private lazy val fuzzyClusterCtes: String =
    shingleBase3.replaceFirst("WITH ", "WITH RECURSIVE ") + minhashBandsSql +
      """, cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |          FROM bands a JOIN bands b USING (band, m0, m1)
        |          WHERE a.doc_id < b.doc_id),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (SELECT doc_a, doc_b, count(*) AS inter
        |          FROM cand
        |          JOIN sh sa ON sa.doc_id = doc_a
        |          JOIN sh sb ON sb.doc_id = doc_b AND sb.sh = sa.sh
        |          GROUP BY 1, 2),
        |qual AS (SELECT doc_a, doc_b FROM pairs
        |  JOIN cnt ca ON doc_a = ca.doc_id
        |  JOIN cnt cb ON doc_b = cb.doc_id
        |  WHERE cast(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5),
        |sym AS (SELECT doc_a AS a, doc_b AS b FROM qual
        |        UNION ALL SELECT doc_b, doc_a FROM qual),
        |reach(a, b) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
        |canon AS (SELECT a AS id, least(a, min(b)) AS canonical
        |          FROM reach GROUP BY a),
        |lab AS (SELECT d.doc_id, coalesce(c.canonical, d.doc_id) AS cl,
        |               length(d.text) AS q
        |        FROM documents d LEFT JOIN canon c ON d.doc_id = c.id),
        |surv AS (SELECT cl, doc_id AS canonical_id FROM (
        |  SELECT cl, doc_id,
        |         row_number() OVER (PARTITION BY cl ORDER BY q DESC, doc_id) AS rn
        |  FROM lab) WHERE rn = 1),
        |sizes AS (SELECT cl, cast(count(*) AS BIGINT) AS cluster_size
        |          FROM lab GROUP BY cl)""".stripMargin

  /** q137's verified semantic-cluster chain (k-means-bucketed cosine
    * pairs → CC → max-energy survivor), shared by q137 and the dedup
    * cascade q147 — ONE implementation, two gates. */
  private def semanticClusters(s: org.apache.spark.sql.SparkSession,
                               dir: String): org.apache.spark.sql.DataFrame = {
    // the Lloyd fit session-caches on the corpus dir, and (round-12)
    // the CC labeling on top of it materializes too: q137 and the q147
    // cascade share one training run AND one clustering run per session
    val store = graft.util.SessionStore.getOrBuild(
      s"semclus|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
      "semclus") { p =>
      val emb = Tables.embeddings(s, dir)
      val pairs = Similarity.semanticDupPairsCached(emb, dir,
          tau = 0.40, k = 8, iters = 2)
        .select(col("vec_a").as("a"), col("vec_b").as("b"))
      val e = Similarity.prepared(emb)
      Dedup.clusterPairsBy(
        e.select(col("vec_id").as("doc_id"), col("q")),
        pairs, Similarity.dotL(col("q"), col("q")))
        .select(col("doc_id").as("vec_id"), col("canonical_id"),
          col("cluster_size"))
        .write.parquet(s"$p/clusters")
    }
    s.read.parquet(s"$store/clusters")
  }

  /** [[semanticClusters]]' oracle CTE chain (s-prefixed so it composes
    * with [[fuzzyClusterCtes]] in one WITH RECURSIVE) — ends with
    * `slab(vec_id, cl, qq)` and `ssurv(cl, canonical_id)` in scope. */
  private lazy val semanticClusterCtes: String = {
    def cos(a: String, b: String) =
      s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
    s"""${KMeans.assignCtesSql(k = 8, iters = 2, dim = 64)},
       |squal AS (SELECT a.vec_id AS a, b.vec_id AS b
       |  FROM final a JOIN final b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE ${cos("a.q", "b.q")} >= 0.40),
       |ssym AS (SELECT a, b FROM squal UNION ALL SELECT b, a FROM squal),
       |sreach(a, b) AS (SELECT a, b FROM ssym
       |  UNION SELECT r.a, s.b FROM sreach r JOIN ssym s ON r.b = s.a),
       |scanon AS (SELECT a AS id, least(a, min(b)) AS canonical
       |           FROM sreach GROUP BY a),
       |em AS (SELECT vec_id,
       |    list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
       |  FROM embeddings),
       |slab AS (SELECT em.vec_id, coalesce(c.canonical, em.vec_id) AS cl,
       |        list_dot_product(em.q, em.q) AS qq
       |  FROM em LEFT JOIN scanon c ON em.vec_id = c.id),
       |ssurv AS (SELECT cl, vec_id AS canonical_id FROM (
       |  SELECT cl, vec_id, row_number() OVER (PARTITION BY cl
       |      ORDER BY qq DESC, vec_id) AS rn
       |  FROM slab) WHERE rn = 1)""".stripMargin
  }

  /** The q108 prep chain (quality gate → exact dedup → decontaminate →
    * train split → per-language cap → token-budget mix), shared by
    * q108 itself and the grand export composition q133 — ONE
    * implementation, two gates. */
  private def prepMixed(s: org.apache.spark.sql.SparkSession,
                        dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, dir)
    val scored = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .join(docs.select(col("doc_id"), col("text"),
        TextAnalysis.langGuessExpr(col("text")).as("lang_guess")), "doc_id")
      .where(col("quality_score") >= 0.55 && col("n_tokens") >= 20)
    val survivors = Dedup.exact(scored.select("doc_id", "text"))
      .select("doc_id")
    val deduped = scored.join(survivors, "doc_id")
    val cleaned = Dedup.decontaminate(deduped,
      docs.where(col("doc_id") % 97 === 0), n = 3)
    val train = Sampling.assignSplits(cleaned, "doc_id")
      .where(col("split") === "train")
    val capped = Sampling.capPerGroup(train, "doc_id", "lang_guess", k = 60)
      .select(col("doc_id"), col("lang_guess"), col("n_tokens"))
    // final stage: mix to per-language TOKEN budgets (q117's
    // operator) — corpus composition is specified in tokens, so the
    // doc-count cap alone isn't the product shape
    Sampling.sampleToTokenBudget(capped, "doc_id", "lang_guess",
      "n_tokens", MixBudgets, MixDefaultBudget)
  }

  /** [[prepMixed]]'s oracle CTE chain, ending with
    * `prepmixed(doc_id, lang_guess, n_tokens)` in scope — q108 selects
    * it directly; q133 wraps it in the shard/pos arithmetic. */
  private lazy val prepMixedCtes: String = {
    def sh3(src: String) =
      s"""SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS sh
         |  FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t)-1, 1))) AS i
         |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM $src))""".stripMargin
    s"""q AS (SELECT doc_id, cast(len(t) AS BIGINT) AS n_tokens,
       |    (cast(length(text) - (len(t) - 1) AS DOUBLE) / len(t)) * 0.1
       |      + cast($stopSumSql AS DOUBLE) / len(t) AS quality_score
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)),
       |sc AS (SELECT doc_id, lang, text, $langScoresSql FROM documents),
       |lg AS (SELECT doc_id, text, $langGuessCaseSql AS lang_guess FROM sc),
       |scored AS (SELECT lg.doc_id, lg.text, lg.lang_guess, q.n_tokens
       |  FROM lg JOIN q USING (doc_id)
       |  WHERE q.quality_score >= 0.55 AND q.n_tokens >= 20),
       |surv AS (SELECT min(doc_id) AS doc_id FROM scored GROUP BY md5(text)),
       |dd AS (SELECT * FROM scored WHERE doc_id IN (SELECT doc_id FROM surv)),
       |evsh AS (SELECT DISTINCT sh FROM (
       |  ${sh3("(SELECT * FROM documents WHERE doc_id % 97 = 0)")})),
       |ddsh AS (${sh3("dd")}),
       |contam AS (SELECT DISTINCT doc_id FROM ddsh JOIN evsh USING (sh)),
       |clean AS (SELECT * FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
       |tr AS (SELECT * FROM clean WHERE ${Sampling.bucketSql("doc_id", "split")} < 80),
       |capped AS (SELECT doc_id, lang_guess, n_tokens,
       |    row_number() OVER (PARTITION BY lang_guess
       |      ORDER BY ${Sampling.rowHashSql("doc_id", "cap")}, doc_id) AS rk
       |  FROM tr),
       |kept AS (SELECT doc_id, lang_guess, n_tokens FROM capped WHERE rk <= 60),
       |mixed AS (SELECT doc_id, lang_guess, n_tokens,
       |    ${Sampling.cumTokensSql("doc_id", "lang_guess", "n_tokens", "mix")} AS cum
       |  FROM kept),
       |prepmixed AS (SELECT doc_id, lang_guess, n_tokens FROM mixed
       |  WHERE cum <= ${Sampling.budgetSql("lang_guess", MixBudgets, MixDefaultBudget)})""".stripMargin
  }

  /** SimHash fingerprint CTEs ending in `s(doc_id, simhash)`, generated
    * from the engine's constants at a given width — shared by q33/q77
    * (fixture 16-bit) and q92 (production 64-bit). Bits 60+ read the
    * second md5 stream, mirroring `Dedup.hash64b`. */
  /** The simhash CTE chain with PREFIXED names (`{p}tok`, `{p}bits`,
    * `{p}s`) so it composes into oracles whose other fragments already
    * use the bare names (q126 unions it with the image-dHash chain,
    * which defines its own `bits`/`dims`). */
  private def simhashCtesFor(bits: Int, p: String,
                             src: String = "documents"): String = {
    val h2 = if (bits > 60) ", " + sqlHash64("'#' || token") + " AS h2" else ""
    def bitExpr(j: Int) = if (j < 60) s"((h >> $j) & 1)" else s"((h2 >> ${j - 60}) & 1)"
    s"${p}tok AS (SELECT doc_id, " + sqlHash64("token") + s" AS h$h2 FROM (" +
      s"SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM $src)),\n" +
      s"${p}bits AS (SELECT doc_id, " +
      (0 until bits).map(j =>
        s"sum((${bitExpr(j)}) * 2 - 1) AS s$j").mkString(", ") +
      s" FROM ${p}tok GROUP BY doc_id),\n" +
      s"${p}s AS (SELECT doc_id, cast(" +
      (0 until bits).map(j =>
        s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ") +
      s" AS BIGINT) AS simhash FROM ${p}bits)\n"
  }

  private def simhashSqlFor(bits: Int): String =
    "WITH " + simhashCtesFor(bits, "")

  private val simhashSql: String = simhashSqlFor(Dedup.SimhashBits)

  /** Minhash signature + LSH band CTEs over `sh` (continuation of a
    * shingle base), generated from the engine's own constants — shared
    * by q32 (in-corpus banding) and q73 (batch-vs-corpus banding). */
  private val minhashBandsSql: String =
    ", mh AS (SELECT doc_id, " +
      (0 until Dedup.MinhashK).map(i =>
        s"min(${sqlHash64(s"'$i:' || sh")}) AS mh$i").mkString(", ") +
      " FROM sh GROUP BY doc_id),\n" +
      "bands AS (" +
      (0 until Dedup.MinhashBands).map(b =>
        s"SELECT doc_id, $b AS band, mh${2 * b} AS m0, mh${2 * b + 1} AS m1 FROM mh")
        .mkString(" UNION ALL ") + ")\n"

  /** The shared session substring-index store over the RAW corpus —
    * three id-ordered micro-batches through maintainSubstringIndex's
    * verbatim batch body (the q214 delivery discipline). q216 reads
    * its boilerplate report, q217 its cross-batch pair log; the
    * id-third slicing here must stay in lockstep with q217's oracle
    * CASE. */
  private def winnowStore(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    graft.util.SessionStore.getOrBuild(
      s"subwin|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
      "subwin") { p =>
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val (lo, hi) = docs
        .agg(org.apache.spark.sql.functions.min(col("doc_id")),
          org.apache.spark.sql.functions.max(col("doc_id")))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
        .head()
      val c1 = lo + (hi - lo) / 3
      val c2 = lo + 2 * (hi - lo) / 3
      val slices = Seq(
        col("doc_id") <= c1,
        col("doc_id") > c1 && col("doc_id") <= c2,
        col("doc_id") > c2)
      slices.zipWithIndex.foreach { case (pred, bid) =>
        StreamIngest.substringIndexBatch(
          docs.where(pred), s"$p/store", bid.toLong, minLen = 40, k = 20)
        // TORN-APPEND REPLAY mid-stream (round-15): after the first
        // batch, tear its texts append (drop one settled document's
        // row — the state a crash mid-job-commit leaves) and replay
        // the batch. The replay must heal exactly the torn document
        // WITHOUT logging within-batch pairs against its torn-visible
        // batch-mates (the batch-stamp corpus exclusion) and WITHOUT
        // re-counting it (per-doc count deltas fold) — q216/q217/q224
        // hash-mismatch at every SF otherwise.
        if (bid == 0) {
          val tornId = docs.where(pred)
            .agg(org.apache.spark.sql.functions.max(col("doc_id")))
            .head().getLong(0)
          val tx = s.read.parquet(s"$p/store/texts").localCheckpoint(true)
          tx.where(col("doc_id") =!= tornId)
            .write.mode("overwrite").parquet(s"$p/store/texts")
          StreamIngest.substringIndexBatch(
            docs.where(pred), s"$p/store", 0L, minLen = 40, k = 20)
        }
        // UPGRADE-IN-PLACE mid-stream (round-15): after the second
        // batch, strip the counts sidecar and rewrite the meta to its
        // pre-flag form — the exact state a pre-r15 store is in when
        // new code takes over. The third batch must then backfill the
        // sidecar from settled texts and re-establish completeness
        // BEFORE appending its own delta; q216/q224's green rows prove
        // the upgraded store's fold path loses no pre-upgrade document
        // at every SF (an incomplete backfill undercounts and
        // hash-mismatches the one-shot oracle).
        if (bid == 1) {
          val store = new org.apache.hadoop.fs.Path(s"$p/store")
          val fs = store.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(s"$p/store/counts"), true)
          val m = fs.create(
            new org.apache.hadoop.fs.Path(s"$p/store/_meta.json"), true)
          try m.write("""{"minLen":40,"k":20}""".getBytes("UTF-8"))
          finally m.close()
          // a genuine pre-r15 store also has no r16 completeness
          // sidecar (create-only flag file) — remove it or the
          // simulated downgrade is incomplete and the fold path would
          // be trusted against the stripped counts
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$p/store/_counts_complete.json"), false)
        }
      }
      // production posture: the maintained store runs with compaction
      // ON, so the registered reads price the FOLDED store (counts at
      // one row per passage) — the driver gate then proves the fold
      // path end-to-end, not just the delta path
      StreamIngest.compactSubstringStores(s, s"$p/store", 2L, 8)
    }

  /** The q142 fixture: documents with deterministic synthetic PII
    * injected into doc_id % 13 = 5 (the q64 discipline — the 'pii'
    * funnel rung must be exercised by real rows). Shared by the
    * one-shot funnel (q142) and its maintained twin (q221). */
  private def piiInjectedDocs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      org.apache.spark.sql.functions.when(col("doc_id") % 13 === 5,
        concat(col("text"), lit(" reach user"),
          col("doc_id").cast("string"), lit("@example.com")))
        .otherwise(col("text")).as("text"))

  /** The q226/q227 out-of-order fixture corpus: the raw documents with
    * CONTENT TWINS injected — each odd bottom-third doc at
    * doc_id % 14 == 3 carries the text AND lang of the doc
    * 2·((hi−lo)/3)+2 ids above it (delta even keeps the twin odd, so
    * both sides sit in the router's PREDICTION half; delta's size puts
    * the twin strictly above the top slice cut). Under the REVERSED
    * delivery of [[oooReleaseStore]] the large-id twin always settles
    * first, so the fixture deterministically produces later-arriving
    * smaller-id twins — the out-of-order arrival shape of the
    * reference crawl (fetch_conversation_tweets.py:72-86), which the
    * organic fixture (no exact duplicates at any gate SF) cannot. */
  private def twinInjectedDocs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    val (lo, hi) = d
      .agg(org.apache.spark.sql.functions.min(col("doc_id")),
        org.apache.spark.sql.functions.max(col("doc_id")))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .head()
    val delta = 2 * ((hi - lo) / 3) + 2
    val c1 = lo + (hi - lo) / 3
    val e = d.select(col("doc_id").as("e_id"), col("lang").as("e_lang"),
      col("text").as("e_text"))
    d.join(e,
      col("e_id") === col("doc_id") + delta &&
        col("doc_id") % 14 === 3 && col("doc_id") <= c1, "left")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.when(col("e_id").isNull, col("lang"))
          .otherwise(col("e_lang")).as("lang"),
        org.apache.spark.sql.functions.when(col("e_id").isNull, col("text"))
          .otherwise(col("e_text")).as("text"))
  }

  /** [[twinInjectedDocs]] as a DuckDB CTE pair (`bnd`, `dtwin`) —
    * shared verbatim by the q226 and q227 oracles. */
  private val twinInjectedSql: String =
    """bnd AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
      |dtwin AS (SELECT d.doc_id,
      |    CASE WHEN e.doc_id IS NULL THEN d.lang ELSE e.lang END AS lang,
      |    CASE WHEN e.doc_id IS NULL THEN d.text ELSE e.text END AS text
      |  FROM documents d CROSS JOIN bnd b
      |  LEFT JOIN documents e
      |    ON e.doc_id = d.doc_id + 2 * ((b.hi - b.lo) // 3) + 2
      |   AND d.doc_id % 14 = 3
      |   AND d.doc_id <= b.lo + (b.hi - b.lo) // 3)""".stripMargin

  /** First-principles re-derivation of the release store's late
    * sidecar over the twin-injected reversed delivery, ending with
    * `perb(batch_id, n_late_smaller_id)` in scope — per batch, the
    * gate-passing batch keepers whose hash settled earlier under a
    * larger id. Shared VERBATIM by q226 (the per-batch counts) and
    * q229 (their magnitude histogram), so the two consumers of the
    * sidecar cannot drift. */
  private lazy val lateArrivalsCtes: String =
    s"""$twinInjectedSql,
       |${releaseCleanCtes("dtwin")},
       |sl AS (SELECT c.doc_id, md5(c.text) AS h,
       |    CASE WHEN c.doc_id > b.lo + (2 * (b.hi - b.lo)) // 3 THEN 0
       |         WHEN c.doc_id > b.lo + (b.hi - b.lo) // 3 THEN 1
       |         ELSE 2 END AS batch_id
       |  FROM clean c CROSS JOIN bnd b),
       |keepb AS (SELECT h, batch_id, min(doc_id) AS doc_id
       |          FROM sl GROUP BY h, batch_id),
       |lateb AS (SELECT k.batch_id FROM keepb k
       |  JOIN (SELECT k2.h, k2.batch_id, min(s.doc_id) AS settled_id
       |        FROM keepb k2 JOIN sl s
       |          ON s.h = k2.h AND s.batch_id < k2.batch_id
       |        GROUP BY k2.h, k2.batch_id) t
       |    ON k.h = t.h AND k.batch_id = t.batch_id
       |  WHERE k.doc_id < t.settled_id),
       |perb AS (SELECT cast(batch_id AS BIGINT) AS batch_id,
       |         cast(count(*) AS BIGINT) AS n_late_smaller_id
       |         FROM lateb GROUP BY batch_id)""".stripMargin

  /** The OUT-OF-ORDER maintained release store (the shared session
    * fixture of q226/q227/q229 — three registered consumers, the
    * ≥2-consumers amortization discipline): the
    * twin-injected corpus delivered through the verbatim
    * [[graft.streaming.StreamIngest.releaseBatch]] body in REVERSED
    * id-order slices (top third first), then compacted — the arrival
    * shape the crawl's id-ordered parity contract does NOT cover, so
    * the store's order-independent laws (late-arrival counts, global
    * keeper min-fold) get real, non-empty gates. */
  private def oooReleaseStore(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    graft.util.SessionStore.getOrBuild(
      s"relood|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
      "relood") { p =>
      val docs = twinInjectedDocs(s, dir).localCheckpoint(true)
      TextAnalysis.langIdWeights(docs).write.parquet(s"$p/weights")
      val (lo, hi) = docs
        .agg(org.apache.spark.sql.functions.min(col("doc_id")),
          org.apache.spark.sql.functions.max(col("doc_id")))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
        .head()
      val c1 = lo + (hi - lo) / 3
      val c2 = lo + 2 * (hi - lo) / 3
      // REVERSED delivery: batch 0 = top third, …, batch 2 = bottom
      val slices = Seq(
        col("doc_id") > c2,
        col("doc_id") > c1 && col("doc_id") <= c2,
        col("doc_id") <= c1)
      slices.zipWithIndex.foreach { case (pred, bid) =>
        graft.streaming.StreamIngest.releaseBatch(docs.where(pred),
          s"$p/store", s"$p/weights", bid.toLong, minLen = 40, k = 20)
      }
      graft.streaming.StreamIngest.compactReleaseStores(s, s"$p/store", 2L, 8)
    }

  /** q142's funnel oracle — injection, every signal, the priority
    * CASE, the (lang, reason) rollup. Shared VERBATIM by q221 (the
    * maintained sidecar fold must be hash-equal to the one-shot). */
  private lazy val filterFunnelOracleSql: String = {
    val piiCounts = TextAnalysis.PiiPatterns.map { case (name, re, _) =>
      s"cast(len(regexp_extract_all(text, '$re')) AS BIGINT) AS n_$name" }
      .mkString(",\n  ")
    s"""WITH base AS (SELECT doc_id, lang,
       |    CASE WHEN doc_id % 13 = 5
       |      THEN text || ' reach user' || cast(doc_id AS VARCHAR) || '@example.com'
       |      ELSE text END AS text
       |  FROM documents),
       |sc AS (SELECT doc_id, lang, text, $langScoresSql FROM base),
       |g AS (SELECT doc_id, $langGuessCaseSql AS lang_guess FROM sc),
       |tok AS (SELECT doc_id, cast(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |        FROM base),
       |reps AS (SELECT doc_id, cast(sum(c) AS BIGINT) AS n_grams,
       |               cast(max(c) AS BIGINT) AS top_rep FROM
       |  (SELECT doc_id, g2, count(*) AS c FROM
       |    (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g2
       |     FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
       |           FROM (SELECT doc_id, string_split(text, ' ') AS t
       |                 FROM base) WHERE len(t) >= 2))
       |   GROUP BY 1, 2) GROUP BY doc_id),
       |pii AS (SELECT doc_id, $piiCounts FROM base),
       |r AS (SELECT b.lang, tok.n_tokens,
       |  CASE WHEN g.lang_guess <> b.lang THEN 'lang_mismatch'
       |       WHEN tok.n_tokens < 25 THEN 'too_short'
       |       WHEN coalesce(reps.n_grams, 0) > 0
       |            AND reps.top_rep * 20 >= reps.n_grams THEN 'repetitive'
       |       WHEN pii.n_email + pii.n_ip + pii.n_phone > 0 THEN 'pii'
       |       ELSE 'kept' END AS reason
       |  FROM base b JOIN g USING (doc_id) JOIN tok USING (doc_id)
       |  LEFT JOIN reps USING (doc_id) JOIN pii USING (doc_id))
       |SELECT lang, reason, cast(count(*) AS BIGINT) AS n_docs,
       |  cast(sum(n_tokens) AS BIGINT) AS n_tokens
       |FROM r GROUP BY lang, reason""".stripMargin
  }

  val all: Seq[(String, Q)] = Seq(

    // ── exact dedup: content-hash groupBy, first-wins ──────────────────
    "q30_dedup_exact" -> Q(
      (s, dir) => Dedup.exact(Tables.documents(s, dir)),
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin),

    // ── n-gram Jaccard near-dup similarity join ────────────────────────
    // Oracle mirrors the engine's two-phase semantics EXACTLY (capped
    // candidate generation, exact rescore) with the cap interpolated
    // from the same Scala constant, so the two sides cannot drift at
    // any corpus scale.
    "q31_dedup_ngram_jaccard" -> Q(
      (s, dir) => Dedup.ngramJaccardPairs(Tables.documents(s, dir), n = 5, tau = 0.5),
      shingleBase5 + cappedJaccardPairsSql +
        """SELECT doc_a, doc_b,
          |       cast(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
          |FROM pairs
          |JOIN cnt ca ON doc_a = ca.doc_id
          |JOIN cnt cb ON doc_b = cb.doc_id
          |WHERE cast(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5""".stripMargin),

    // ── one-sided containment near-dup pairs (the subset detector) ─────
    // |A∩B| / min(|A|,|B|): a short doc fully quoted inside a long one
    // scores jaccard ≈ |A|/|B| (arbitrarily low) but containment = 1 —
    // the standard SECOND threshold of production fuzzy dedup, sharing
    // q31's capped candidate generation + exact intersection engine.
    // Injected quote-subset docs (a 12-shingle prefix of an existing
    // doc under +30000 ids) exercise exactly the pairs Jaccard misses.
    "q155_containment_pairs" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val subs = docs.where(col("doc_id") % 29 === 9)
          .select((col("doc_id") + 30000).as("doc_id"),
            org.apache.spark.sql.functions.array_join(
              org.apache.spark.sql.functions.slice(
                split(col("text"), " "), 1, 16), " ").as("text"))
        Dedup.ngramContainmentPairs(
          docs.select(col("doc_id"), col("text")).unionByName(subs),
          n = 5, tau = 0.9)
      },
      """WITH u AS (SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 30000,
        |    array_to_string(string_split(text, ' ')[1:16], ' ')
        |  FROM documents WHERE doc_id % 29 = 9),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM u),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS sh
        |       FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t)-3, 1))) AS i FROM toks)),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |cold AS (SELECT doc_id, sh FROM sh
        |         WHERE sh IN (SELECT sh FROM sh GROUP BY sh
        |                      HAVING count(*) <= """.stripMargin +
        Dedup.DefaultMaxShingleDf +
        """)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM cold a JOIN cold b USING (sh) WHERE a.doc_id < b.doc_id),
        |pairs AS (SELECT doc_a, doc_b, count(*) AS inter
        |          FROM cand
        |          JOIN sh sa ON sa.doc_id = doc_a
        |          JOIN sh sb ON sb.doc_id = doc_b AND sb.sh = sa.sh
        |          GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |       cast(inter AS DOUBLE) / least(ca.n, cb.n) AS containment
        |FROM pairs
        |JOIN cnt ca ON doc_a = ca.doc_id
        |JOIN cnt cb ON doc_b = cb.doc_id
        |WHERE cast(inter AS DOUBLE) / least(ca.n, cb.n) >= 0.9""".stripMargin),

    // ── MinHash + LSH banding candidates ───────────────────────────────
    "q32_dedup_minhash_lsh" -> Q(
      (s, dir) => Dedup.minhashCandidates(Tables.documents(s, dir), n = 3),
      shingleBase3 + minhashBandsSql +
        """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
          |FROM bands a JOIN bands b USING (band, m0, m1)
          |WHERE a.doc_id < b.doc_id GROUP BY 1, 2""".stripMargin),

    // ── incremental dedup: new batch vs existing corpus ────────────────
    // Batch = every 7th-residue-3 doc, corpus = the rest; the batch
    // survives only if its content hash AND all its LSH bands miss the
    // corpus. Continuous-ingestion shape: the corpus is probed, never
    // rewritten.
    "q73_dedup_incremental" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.dedupAgainst(
          docs.where(col("doc_id") % 7 === 3),
          docs.where(col("doc_id") % 7 =!= 3), n = 3)
          .select("doc_id", "lang")
      },
      dedupIncrementalSql),

    // ── incremental dedup from a PERSISTED index (zero corpus scans) ───
    // q73 re-fingerprints the corpus every run — at 100 TB that is a
    // full corpus scan per crawl cycle. This variant writes the index
    // ONCE in-query (distinct content hashes + distinct minhash bands,
    // both dedup-key-sized) and dedups the batch against the LOADED
    // artifact: the corpus never appears in the probe plan. Same
    // oracle as q73, so the driver proves the persistence round trip
    // is semantically invisible — q105/q127's discipline applied to
    // the dedup side.
    "q134_dedup_indexed" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val path = Similarity.scratchIndexDir("q134") + "/dedupidx"
        Dedup.saveDedupIndex(docs.where(col("doc_id") % 7 =!= 3), n = 3, path)
        Dedup.dedupAgainstIndex(docs.where(col("doc_id") % 7 === 3),
          n = 3, path)
          .select("doc_id", "lang")
      },
      dedupIncrementalSql),

    // ── incremental-dedup PROVENANCE (why each batch doc was dropped) ──
    // q73 emits the survivors; operations needs the complement WITH
    // EVIDENCE: for every near-dup batch doc, WHICH corpus document
    // matched it and at what similarity — the audit trail behind a
    // drop decision. Candidates are the batch↔corpus band collisions
    // (the q73 economics, asymmetric), verified by exact Jaccard over
    // full shingle sets (q120's verify stage). Oracle replays bands +
    // verify on the same split.
    "q156_dedup_provenance" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val cand = Dedup.minhashBands(docs.where(col("doc_id") % 7 === 3), n = 3)
          .select(col("band"), col("m0"), col("m1"), col("doc_id").as("doc_a"))
          .join(Dedup.minhashBands(docs.where(col("doc_id") % 7 =!= 3), n = 3)
            .select(col("band"), col("m0"), col("m1"), col("doc_id").as("doc_b")),
            Seq("band", "m0", "m1"))
          .select(col("doc_a"), col("doc_b")).distinct()
        Dedup.jaccardVerifyPairs(docs, cand, n = 3, tau = 0.5)
      },
      shingleBase3 + minhashBandsSql +
        """, cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |          FROM bands a JOIN bands b USING (band, m0, m1)
          |          WHERE a.doc_id % 7 = 3 AND b.doc_id % 7 <> 3),
          |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
          |pairs AS (SELECT doc_a, doc_b, count(*) AS inter
          |          FROM cand
          |          JOIN sh sa ON sa.doc_id = doc_a
          |          JOIN sh sb ON sb.doc_id = doc_b AND sb.sh = sa.sh
          |          GROUP BY 1, 2)
          |SELECT doc_a, doc_b,
          |       cast(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
          |FROM pairs
          |JOIN cnt ca ON doc_a = ca.doc_id
          |JOIN cnt cb ON doc_b = cb.doc_id
          |WHERE cast(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5""".stripMargin),

    // ── end-to-end near-dedup: pairs → connected components → clusters ─
    "q45_dedup_clusters" -> Q(
      (s, dir) => Dedup.nearDupClusters(Tables.documents(s, dir), n = 5, tau = 0.5),
      nearDupClustersOracleSql),

    // ── INCREMENTAL component maintenance (continuous-dedup contract) ──
    // q45 re-clusters the whole corpus; a continuous crawl folds each
    // batch in: the settled labeling comes from the OLD-only pair
    // subgraph (both endpoints outside the doc_id%7=3 batch), then
    // ConnectedComponents.addEdges merges the batch-incident pairs —
    // batch endpoints CONTRACT through the old labels, so the merge CC
    // runs on a batch-sized edge set and the settled labeling is only
    // probed (two equi-joins), never re-traversed. New edges may
    // BRIDGE old clusters — the case forest closure (q180) never
    // faces. The oracle is q45's full-corpus clustering VERBATIM: the
    // driver proves incremental == full recompute, hash-equal.
    "q181_cc_add" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // checkpoint the pair relation: the old-CC loop, the merge
        // stage, and the endpoint sets otherwise each re-derive the
        // full Jaccard join through their own lineages
        val pairs = Dedup.ngramJaccardPairs(docs, n = 5, tau = 0.5)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
          .localCheckpoint(true)
        def isNew(c: org.apache.spark.sql.Column) = c % 7 === 3
        val oldLabels = graft.graph.ConnectedComponents.run(
          pairs.where(!isNew(col("a")) && !isNew(col("b"))))
        val labels = graft.graph.ConnectedComponents.addEdges(oldLabels,
          pairs.where(isNew(col("a")) || isNew(col("b"))))
        // q45's cluster wrapper over the incremental labels
        val labeled = docs.select(col("doc_id"))
          .join(labels, col("doc_id") === col("id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("canonical_id"))
        val sizes = labeled.groupBy(col("canonical_id").as("_c"))
          .agg(count(lit(1)).as("cluster_size"))
        labeled.join(sizes, labeled("canonical_id") === col("_c"))
          .select(col("doc_id"), col("canonical_id"), col("cluster_size"))
      },
      nearDupClustersOracleSql),

    // ── PRODUCTION delta path: label maintenance vs a PERSISTED store ──
    // q181 derives the full pair relation and the old labeling in-query
    // so the full-recompute oracle can gate it — a verification shape
    // whose bench row prices an upper bound. This query prices the
    // per-batch OPERATING cost of continuous dedup clustering: the
    // settled labeling and the batch-incident verified pairs are
    // session artifacts (built once in-query; the batch-side pair
    // derivation itself is priced by the q73/q134/q120 family — here
    // the batch arrives as the crawl's verified pair relation, exactly
    // the ScaleProbe contract), and the registered plan is
    // ConnectedComponents.addEdges against the persisted labeling plus
    // q45's cluster wrapper. The settled labeling parquet is scanned
    // exactly twice (endpoint contraction + label lift), every batch
    // join is broadcast (PlanSpec pins both), and the oracle stays
    // q45's full-corpus clustering VERBATIM — the driver proves the
    // upserted store equals the full recompute, hash-equal.
    "q192_cc_delta" -> Q(
      (s, dir) => {
        val store = graft.util.SessionStore.getOrBuild(
          s"ccdelta|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
          "ccdelta") { p =>
          val docs = Tables.documents(s, dir)
          val pairs = Dedup.ngramJaccardPairs(docs, n = 5, tau = 0.5)
            .select(col("doc_a").as("a"), col("doc_b").as("b"))
            .localCheckpoint(true)
          def isNew(c: org.apache.spark.sql.Column) = c % 7 === 3
          graft.graph.ConnectedComponents.run(
              pairs.where(!isNew(col("a")) && !isNew(col("b"))))
            .write.parquet(s"$p/labels")
          pairs.where(isNew(col("a")) || isNew(col("b")))
            .write.parquet(s"$p/batch")
        }
        val merged = graft.graph.ConnectedComponents.addEdges(
          s.read.parquet(s"$store/labels"), s.read.parquet(s"$store/batch"))
        // q45's cluster wrapper over the maintained labels
        val labeled = Tables.documents(s, dir).select(col("doc_id"))
          .join(merged, col("doc_id") === col("id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("canonical_id"))
        val sizes = labeled.groupBy(col("canonical_id").as("_c"))
          .agg(count(lit(1)).as("cluster_size"))
        labeled.join(sizes, labeled("canonical_id") === col("_c"))
          .select(col("doc_id"), col("canonical_id"), col("cluster_size"))
      },
      nearDupClustersOracleSql),

    // ── survivor policy: same clusters, keep the LONGEST member ────────
    // q45's pipeline with clusterPairsBy(quality = text length): the
    // canonical id of each near-dup cluster is the longest document
    // (ties → smallest id), the policy training pipelines actually want.
    "q57_dedup_survivor" -> Q(
      // survivor policy re-derived from the SESSION clustering store
      // (round-16): the survivor pick is a pure transform of the q45
      // labeling — group per cluster, max_by (quality, −doc_id) — so it
      // must not re-run the pairs→CC chain per query. Identical output
      // to Dedup.clusterPairsBy over the same pairs (same cluster key,
      // same size, same max_by policy); the unchanged WITH RECURSIVE
      // oracle proves it at every SF.
      (s, dir) => {
        val f = org.apache.spark.sql.functions
        val cl = jaccard5Clusters(s, dir)
        val labeled = cl.join(
          Tables.documents(s, dir)
            .select(col("doc_id"), f.length(col("text")).as("_q")),
          Seq("doc_id"))
        val surv = labeled.groupBy(col("canonical_id").as("_cl"))
          .agg(f.max_by(col("doc_id"),
            f.struct(col("_q"), (-col("doc_id")).as("_nid"))).as("_surv"))
        labeled.join(surv, col("canonical_id") === col("_cl"))
          .select(col("doc_id"), col("_surv").as("canonical_id"),
            col("cluster_size"))
      },
      shingleBase5.replaceFirst("WITH ", "WITH RECURSIVE ") + cappedJaccardPairsSql +
        """, qual AS (
          |  SELECT doc_a, doc_b FROM pairs
          |  JOIN cnt ca ON doc_a = ca.doc_id
          |  JOIN cnt cb ON doc_b = cb.doc_id
          |  WHERE cast(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5),
          |sym AS (SELECT doc_a AS a, doc_b AS b FROM qual
          |        UNION ALL SELECT doc_b, doc_a FROM qual),
          |reach(a, b) AS (
          |  SELECT a, b FROM sym
          |  UNION
          |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
          |canon AS (SELECT a AS id, least(a, min(b)) AS canonical
          |          FROM reach GROUP BY a),
          |lab AS (SELECT d.doc_id, coalesce(c.canonical, d.doc_id) AS cl,
          |               length(d.text) AS q
          |        FROM documents d LEFT JOIN canon c ON d.doc_id = c.id),
          |surv AS (SELECT cl, doc_id AS canonical_id FROM (
          |  SELECT cl, doc_id,
          |         row_number() OVER (PARTITION BY cl ORDER BY q DESC, doc_id) AS rn
          |  FROM lab) WHERE rn = 1)
          |SELECT l.doc_id, s.canonical_id,
          |       count(*) OVER (PARTITION BY l.cl) AS cluster_size
          |FROM lab l JOIN surv s USING (cl)""".stripMargin),

    // ── SimHash fingerprints ───────────────────────────────────────────
    "q33_dedup_simhash" -> Q(
      (s, dir) => Dedup.simhash(Tables.documents(s, dir)),
      simhashSql + "SELECT doc_id, simhash FROM s"),

    // ── exact Hamming near-dup pairs over SimHash (pigeonhole bands) ───
    // The engine's banded equi-join must emit EXACTLY the brute-force
    // all-pairs result — the oracle is that brute force, so the
    // pigeonhole candidate guarantee is hash-verified.
    "q77_simhash_hamming" -> Q(
      (s, dir) => Dedup.simhashHammingPairs(Tables.documents(s, dir), maxDist = 3),
      simhashSql +
        """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |       cast(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
          |FROM s a JOIN s b ON a.doc_id < b.doc_id
          |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin),

    // ── production-width SimHash: 64-bit fingerprints, 16-bit bands ────
    // Same banded plan as q77 with the width constants a production
    // corpus needs: 2⁶⁴ fingerprint space doesn't saturate, so the
    // surviving pairs are TRUE near-dups (the 16-bit fixture emits
    // millions of coincidental ones at sf0.1). The oracle is again the
    // brute force all-pairs scan, so the pigeonhole band guarantee is
    // hash-verified at full width, including the sign bit (bit 63).
    "q92_simhash_wide" -> Q(
      (s, dir) => Dedup.simhashHammingPairs(Tables.documents(s, dir),
        maxDist = 3, bits = 64, nBands = 4),
      simhashSqlFor(64) +
        """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |       cast(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
          |FROM s a JOIN s b ON a.doc_id < b.doc_id
          |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin),

    // ── z-order box query (superset prefilter + exact refilter) ────────
    // The z-range [z(x0,y0), z(x1,y1)] is a candidate superset of the
    // box (what a z-sorted layout answers from min/max stats); the
    // exact box predicate refilters, so the result must equal the
    // oracle's direct scan. z is emitted so the interleave arithmetic
    // itself is hash-verified against the generated SQL form.
    "q79_zorder_box" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        graft.util.ZOrder.boxFilter(li,
            col("l_partkey").bitwiseAND(lit(65535L)),
            col("l_suppkey").bitwiseAND(lit(65535L)),
            x0 = 100L, x1 = 300L, y0 = 10L, y1 = 50L)
          .select(col("l_orderkey"), col("l_linenumber"),
            graft.util.ZOrder.zValue(
              col("l_partkey").bitwiseAND(lit(65535L)),
              col("l_suppkey").bitwiseAND(lit(65535L))).as("z"))
      },
      s"""SELECT l_orderkey, l_linenumber,
         |  cast(${graft.util.ZOrder.zValueSql("(l_partkey & 65535)", "(l_suppkey & 65535)")} AS BIGINT) AS z
         |FROM lineitem
         |WHERE (l_partkey & 65535) BETWEEN 100 AND 300
         |  AND (l_suppkey & 65535) BETWEEN 10 AND 50""".stripMargin),

    // ── 3-d z-order box with per-dim bit budgets ───────────────────────
    // Layout tuning at 100 TB wants 3-4 clustered dimensions with a
    // coarse one spending fewer curve bits (here 16/12/8): the n-dim
    // level-order interleave keeps z monotone per coordinate, so the
    // same superset-prefilter + exact-refilter pattern as q79 applies.
    // z is emitted so the full interleave arithmetic is hash-verified
    // against the SQL generated from the same layout definition.
    "q95_zorder_box3" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val dims = Seq(
          (col("l_partkey").bitwiseAND(lit(65535L)), 100L, 300L),
          (col("l_suppkey").bitwiseAND(lit(4095L)), 10L, 50L),
          (col("l_orderkey").bitwiseAND(lit(255L)), 32L, 160L))
        val budgets = Seq(16, 12, 8)
        graft.util.ZOrder.boxFilterN(li, dims, budgets)
          .select(col("l_orderkey"), col("l_linenumber"),
            graft.util.ZOrder.zValueN(dims.map(_._1), budgets).as("z"))
      },
      s"""SELECT l_orderkey, l_linenumber,
         |  cast(${graft.util.ZOrder.zValueSqlN(
               Seq("(l_partkey & 65535)", "(l_suppkey & 4095)", "(l_orderkey & 255)"),
               Seq(16, 12, 8))} AS BIGINT) AS z
         |FROM lineitem
         |WHERE (l_partkey & 65535) BETWEEN 100 AND 300
         |  AND (l_suppkey & 4095) BETWEEN 10 AND 50
         |  AND (l_orderkey & 255) BETWEEN 32 AND 160""".stripMargin),

    // ── pivot (crosstab): per-source language histogram ────────────────
    "q80_pivot" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("source"))
        .pivot("lang", Seq("en", "de", "es", "fr", "zh"))
        .count()
        .na.fill(0L, Seq("en", "de", "es", "fr", "zh")),
      """SELECT source,
        |  count(*) FILTER (lang = 'en') AS en,
        |  count(*) FILTER (lang = 'de') AS de,
        |  count(*) FILTER (lang = 'es') AS es,
        |  count(*) FILTER (lang = 'fr') AS fr,
        |  count(*) FILTER (lang = 'zh') AS zh
        |FROM documents GROUP BY source""".stripMargin),

    // ── rollup with grouping flags (subtotal lattice) ──────────────────
    "q81_rollup" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          org.apache.spark.sql.functions.count(lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(
            col("l_quantity").cast("long")).as("sum_qty"),
          org.apache.spark.sql.functions.expr(
            "cast(grouping(l_returnflag) AS BIGINT)").as("g_flag"),
          org.apache.spark.sql.functions.expr(
            "cast(grouping(l_linestatus) AS BIGINT)").as("g_status")),
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  cast(sum(cast(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  cast(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  cast(grouping(l_linestatus) AS BIGINT) AS g_status
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin),

    // ── cube (full subtotal lattice, completing q81's rollup) ──────────
    "q97_cube" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          org.apache.spark.sql.functions.count(lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(
            col("l_quantity").cast("long")).as("sum_qty"),
          org.apache.spark.sql.functions.expr(
            "cast(grouping(l_returnflag) AS BIGINT)").as("g_flag"),
          org.apache.spark.sql.functions.expr(
            "cast(grouping(l_linestatus) AS BIGINT)").as("g_status")),
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  cast(sum(cast(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  cast(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  cast(grouping(l_linestatus) AS BIGINT) AS g_status
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin),

    // ── set operations: INTERSECT / EXCEPT with provenance tag ─────────
    "q82_setops" -> Q(
      (s, dir) => {
        val heavy = Tables.lineitem(s, dir)
          .where(col("l_quantity") > 45).select(col("l_suppkey").as("k"))
        val nearby = Tables.supplier(s, dir)
          .where(col("s_nationkey") < 5).select(col("s_suppkey").as("k"))
        heavy.intersect(nearby).select(lit("both").as("tag"), col("k"))
          .unionAll(heavy.except(nearby).select(lit("only_heavy").as("tag"), col("k")))
      },
      """WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45),
        |b AS (SELECT s_suppkey AS k FROM supplier WHERE s_nationkey < 5)
        |SELECT 'both' AS tag, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
        |UNION ALL
        |SELECT 'only_heavy' AS tag, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)""".stripMargin),

    // ── full outer join (both sides preserved) ─────────────────────────
    // Customers vs order-holders: customers without orders AND order
    // keys without a customer row both survive with nulls.
    "q83_full_outer" -> Q(
      (s, dir) => {
        val custSpend = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("custkey"))
          .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_orders"))
        val names = Tables.customer(s, dir)
          .where(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("custkey"), col("c_name"))
        names.join(custSpend, Seq("custkey"), "full_outer")
          .select(col("custkey"), col("c_name"), col("n_orders"))
      },
      """SELECT coalesce(n.custkey, o.custkey) AS custkey, n.c_name, o.n_orders
        |FROM (SELECT c_custkey AS custkey, c_name FROM customer WHERE c_custkey % 3 = 0) n
        |FULL OUTER JOIN (SELECT o_custkey AS custkey, count(*) AS n_orders
        |                 FROM orders GROUP BY 1) o
        |USING (custkey)""".stripMargin),

    // ── deliberate cross join (bounded dimension lattice) ──────────────
    "q84_cross_join" -> Q(
      (s, dir) => Tables.region(s, dir).select(col("r_name"))
        .crossJoin(Tables.nation(s, dir).select(col("n_name"), col("n_nationkey")))
        .select(col("r_name"), col("n_name"), col("n_nationkey")),
      """SELECT r_name, n_name, n_nationkey FROM region CROSS JOIN nation""".stripMargin),

    // ── explode_outer: unnest that PRESERVES empty rows ────────────────
    // Tokens longer than 7 chars per doc; docs with none survive with a
    // null token — the left-outer lateral-view semantic q11's plain
    // explode (inner) does not have.
    "q85_explode_outer" -> Q(
      (s, dir) => {
        val toks = org.apache.spark.sql.functions.filter(
          org.apache.spark.sql.functions.split(col("text"), " "),
          t => org.apache.spark.sql.functions.length(t) > 7)
        Tables.documents(s, dir)
          .select(col("doc_id"),
            org.apache.spark.sql.functions.explode_outer(toks).as("long_token"))
      },
      """SELECT doc_id, u.long_token
        |FROM documents LEFT JOIN LATERAL (
        |  SELECT unnest(list_filter(string_split(text, ' '),
        |                            t -> length(t) > 7)) AS long_token
        |) u ON true""".stripMargin),

    // ── null-safe equality join (<=>) ──────────────────────────────────
    // Per-user chain edges where BOTH null parents match a null-keyed
    // dimension row — IS NOT DISTINCT FROM semantics, which a plain
    // equi-join drops.
    "q86_nullsafe_join" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val withParent = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"))
          .withColumn("parent_bucket",
            org.apache.spark.sql.functions.lag(col("event_id") % 10, 1).over(w))
        import s.implicits._
        val dim: Seq[(java.lang.Long, String)] =
          (0L to 9L).map(b => (java.lang.Long.valueOf(b), s"bucket$b")) :+
            ((null.asInstanceOf[java.lang.Long], "root"))
        val dimDf = dim.toDF("parent_bucket", "bucket_name")
        withParent.join(dimDf,
            withParent("parent_bucket") <=> dimDf("parent_bucket"))
          .select(col("event_id"), withParent("parent_bucket"), col("bucket_name"))
      },
      """WITH e AS (SELECT event_id,
        |             lag(event_id % 10) OVER (PARTITION BY user_id
        |                                      ORDER BY ts, event_id) AS parent_bucket
        |           FROM events),
        |d AS (SELECT unnest(range(0, 10)) AS parent_bucket,
        |             'bucket' || cast(unnest(range(0, 10)) AS VARCHAR) AS bucket_name
        |      UNION ALL SELECT NULL, 'root')
        |SELECT e.event_id, e.parent_bucket, d.bucket_name
        |FROM e JOIN d ON e.parent_bucket IS NOT DISTINCT FROM d.parent_bucket""".stripMargin),

    // ── RANGE-frame window (event-time trailing hour, not row count) ───
    // The frame is bounded by the ORDER value (seconds), so rows with
    // sparse/dense timestamps aggregate over a true time horizon — the
    // semantic ROWS frames (q26) cannot express.
    "q87_range_window" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"),
          org.apache.spark.sql.functions.unix_timestamp(col("ts")).as("tsec"),
          org.apache.spark.sql.functions.expr(
            "cast(round(value * 100) AS BIGINT)").as("cents"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("tsec"))
          .rangeBetween(-3600L, 0L)
        ev.select(col("event_id"), col("user_id"), col("tsec"),
          org.apache.spark.sql.functions.sum(col("cents")).over(w).as("hour_cents"),
          org.apache.spark.sql.functions.count(lit(1)).over(w).as("hour_n"))
      },
      """SELECT event_id, user_id,
        |  epoch_us(date_trunc('second', ts)) // 1000000 AS tsec,
        |  cast(sum(cast(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS hour_cents,
        |  cast(count(*) OVER w AS BIGINT) AS hour_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY epoch_us(date_trunc('second', ts)) // 1000000
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin),

    // ── ntile quartiles per stratum ────────────────────────────────────
    "q88_ntile" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
        Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("n_chars"),
          org.apache.spark.sql.functions.ntile(4).over(w).cast("long").as("quartile"))
      },
      """SELECT doc_id, lang, n_chars,
        |  cast(ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS quartile
        |FROM documents""".stripMargin),

    // ── JSON path extraction from a string column ──────────────────────
    "q89_json_extract" -> Q(
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          org.apache.spark.sql.functions.get_json_object(col("props"), "$.k")
            .cast("long").as("k"))
        .where(col("k") % 7 === 0),
      """SELECT event_id, json_extract_string(props, '$.k')::BIGINT AS k
        |FROM events WHERE json_extract_string(props, '$.k')::BIGINT % 7 = 0""".stripMargin),

    // ── ordered funnel (view → click → purchase) ───────────────────────
    // Product-analytics staple: per user, the earliest 'view', the
    // earliest 'click' strictly AFTER it, the earliest 'purchase'
    // strictly after that — sequential dependencies expressed as three
    // window passes over ONE user_id exchange (each step's predicate
    // references the previous step's column; a null upstream step nulls
    // the comparison and the whole chain, matching the oracle's
    // join-chain formulation exactly).
    "q90_funnel" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.functions.{min => fmin, when => fwhen}
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_type"))
          .withColumn("t1",
            fmin(fwhen(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("t2",
            fmin(fwhen(col("event_type") === "click" && col("ts") > col("t1"),
              col("ts"))).over(w))
          .withColumn("t3",
            fmin(fwhen(col("event_type") === "purchase" && col("ts") > col("t2"),
              col("ts"))).over(w))
          .select(col("user_id"), col("t1"), col("t2"), col("t3")).distinct()
          .select(col("user_id"),
            fwhen(col("t3").isNotNull, 3L)
              .when(col("t2").isNotNull, 2L)
              .when(col("t1").isNotNull, 1L)
              .otherwise(0L).as("funnel_depth"),
            col("t1"), col("t2"), col("t3"))
      },
      """WITH s1 AS (SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS t1
        |            FROM events GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2
        |       FROM events e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3
        |       FROM events e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        |SELECT u.user_id,
        |  cast(CASE WHEN s3.t3 IS NOT NULL THEN 3
        |            WHEN s2.t2 IS NOT NULL THEN 2
        |            WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS funnel_depth,
        |  s1.t1, s2.t2, s3.t3
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN s1 USING (user_id)
        |LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)""".stripMargin),

    // ── per-group top-k (rank-limit pushdown per stratum) ──────────────
    "q78_group_topk" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        Tables.documents(s, dir)
          .withColumn("rank",
            org.apache.spark.sql.functions.row_number().over(w).cast("long"))
          .where(col("rank") <= 5)
          .select("lang", "doc_id", "n_chars", "rank")
      },
      """SELECT lang, doc_id, n_chars, cast(rank AS BIGINT) AS rank FROM (
        |  SELECT lang, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents) WHERE rank <= 5""".stripMargin),

    // ── embedding-cosine near-dup pairs (quantized-exact scores) ───────
    "q34_embed_cosine_dup" -> Q(
      (s, dir) => Similarity.cosineDupPairsExact(Tables.embeddings(s, dir), tau = 0.40),
      cosineAllPairsSql),

    // ── LSH-prefiltered cosine pairs == brute force (the scale path) ───
    // Same oracle as q34: the banded-LSH candidates + exact rescore must
    // reproduce the all-pairs result on the fixture — the driver itself
    // verifies that the pruned plan loses nothing.
    "q46_embed_cosine_lsh" -> Q(
      (s, dir) => Similarity.cosineDupPairs(Tables.embeddings(s, dir), tau = 0.40, dim = 64),
      cosineAllPairsSql),

    // ── the PRODUCTION LSH preset, driver-priced ───────────────────────
    // q46 runs the fixture economy (2×16 banding at tau 0.4 — recall-
    // heavy, output-bound: its probe alpha reads the TRUE pair volume).
    // This registers the preset the docs point 100 TB deployments at:
    // 8×8 banding at tau 0.8, ~30× candidate pruning (recall floor
    // property-tested in ExtSpec). The oracle replays the banding
    // STRUCTURALLY from the same hyperplane constants
    // (Similarity.cosineLshOracleSql), so the driver hash-verifies the
    // production path itself — no brute-force crutch needed.
    "q195_cosine_lsh_production" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        // plant near-dup twins (q64's injection discipline): the fixture
        // is near-orthogonal noise, so its TRUE pair set at tau 0.8 is
        // empty and an uninjected run would verify nothing. ×2 scaling
        // is exact in both float and double arithmetic, so the twins'
        // quantized vectors are engine-identical; cos(v, 2v) ≈ 1 after
        // quantization — squarely above the production threshold.
        val twins = emb.where(col("vec_id") % 97 === 3)
          .select((col("vec_id") + 100000).as("vec_id"),
            org.apache.spark.sql.functions.transform(col("embedding"),
              x => x * lit(2.0f)).as("embedding"))
        Similarity.cosineDupPairs(emb.unionByName(twins),
          tau = 0.80, dim = 64, bits = Similarity.ProductionLshBits,
          bands = Similarity.ProductionLshBands)
      },
      Similarity.cosineLshOracleSql(dim = 64, tau = 0.80,
        bits = Similarity.ProductionLshBits,
        bands = Similarity.ProductionLshBands,
        vSql = """SELECT vec_id, embedding FROM embeddings
                 | UNION ALL
                 | SELECT vec_id + 100000,
                 |   list_transform(embedding, x -> x * 2)
                 | FROM embeddings WHERE vec_id % 97 = 3""".stripMargin)),

    // ── the CORPUS-SCALE LSH preset (multi-mask, round-18) ─────────────
    // The 100× probe showed the fixed 8×8 preset's candidate volume is
    // quadratic in n (bands·n²/2^bits with bits pinned — bucket
    // saturation at linear output growth), so corpus scale needs bits
    // to grow with log n: 16×32 = 512 planes on 8 SignMask64 masks,
    // the first bits×bands > 64 configuration (bandedFlat chunks whole
    // bands per mask; plane numbering stays global, so the SAME oracle
    // generator replays it structurally). Same twin injection as q195;
    // verified at the preset's documented tau-0.9 floor. Recall floor
    // property-tested in ExtSpec ("corpus-tau LSH recall").
    "q231_cosine_lsh_corpus" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val twins = emb.where(col("vec_id") % 97 === 3)
          .select((col("vec_id") + 100000).as("vec_id"),
            org.apache.spark.sql.functions.transform(col("embedding"),
              x => x * lit(2.0f)).as("embedding"))
        Similarity.cosineDupPairs(emb.unionByName(twins),
          tau = 0.90, dim = 64, bits = Similarity.CorpusLshBits,
          bands = Similarity.CorpusLshBands)
      },
      Similarity.cosineLshOracleSql(dim = 64, tau = 0.90,
        bits = Similarity.CorpusLshBits,
        bands = Similarity.CorpusLshBands,
        vSql = """SELECT vec_id, embedding FROM embeddings
                 | UNION ALL
                 | SELECT vec_id + 100000,
                 |   list_transform(embedding, x -> x * 2)
                 | FROM embeddings WHERE vec_id % 97 = 3""".stripMargin)),

    // ── brute-force cosine top-k (ANN baseline) ────────────────────────
    "q35_ann_bruteforce" -> Q(
      (s, dir) => Similarity.bruteForceTopK(Tables.embeddings(s, dir), nQueries = 8, k = 5),
      annTopKSql),

    // ── int8-quantized shortlist + exact rerank == brute force ─────────
    // Same oracle as q35: the codes-only shortlist (ByteDot kernel, 8×
    // fewer scan bytes) plus full-precision rerank must reproduce the
    // exact top-k on the fixture — the rescoring contract, verified.
    "q59_ann_int8" -> Q(
      (s, dir) => Similarity.int8TopK(Tables.embeddings(s, dir), nQueries = 8, k = 5),
      annTopKSql),

    // ── PQ-coded ADC top-k (compressed-codebook ANN), exact rerank ─────
    // 4 subspaces × 16 k-means centroids: 2 bytes of code per vector,
    // ADC scoring from a broadcast lookup table, exact rerank of the
    // shortlist. Registered as the PROBE phase against a session-cached
    // persisted index (training is an amortized offline artifact in
    // production — the bench should price the probe, not retraining;
    // the first invocation per session still trains via buildPqIndex).
    // The oracle replays the FULL algorithm (per-subspace Lloyd chains,
    // codes, LUT, shortlist, rerank) from the same constants — training
    // is deterministic, so probe-from-artifact hash-matches it; the
    // fixture embeddings are near-random, so recall-vs-brute-force is a
    // property of the DATA, while the compression arithmetic is what
    // must (and does) match bit-for-bit at any scale. The int8 path
    // (q59) keeps the equals-brute-force contract where quantization
    // error is small.
    "q100_ann_pq" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.pqTopKFromIndex(
          Similarity.sessionPqIndex(emb, dir, dim = 64, m = 4, kSub = 16,
            iters = 1),
          emb, dim = 64, nQueries = 8, k = 5, m = 4, shortlist = 64)
      },
      KMeans.pqOracleSql(dim = 64, nQueries = 8, topK = 5,
        m = 4, kSub = 16, iters = 1, shortlist = 64)),

    // ── IVFPQ: coarse buckets + residual PQ + ADC + exact rerank ───────
    // The composition of the two verified halves (IVF q36/q50, PQ q100)
    // into the architecture a 100 TB vector corpus deploys: the inverted
    // file bounds WHICH vectors are scored (nprobe buckets), the product
    // quantizer bounds WHAT is read per candidate (2 bytes of code), the
    // rerank restores exact scores. The oracle replays the FULL pipeline
    // — coarse Lloyd chain, residual encode, per-subspace residual
    // chains, probe lists, ADC, shortlist, rerank — from the same
    // constants, so the composition arithmetic is hash-verified
    // independent of data-dependent recall (same contract as q100).
    // Like q100, registered as the PROBE phase against a session-cached
    // persisted index (ivfpqTopKFromIndex — partition-pruned bucket
    // reads, the latency a deployment serves); q105 keeps pricing the
    // train+persist path, and ExtSpec pins probe-from-index ==
    // in-memory ivfpqTopK.
    "q101_ann_ivfpq" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.ivfpqTopKFromIndex(
          Similarity.sessionIvfpqIndex(emb, dir, dim = 64, nCoarse = 8,
            m = 4, kSub = 16, iters = 1),
          emb, dim = 64, nQueries = 8, k = 5, m = 4,
          nprobe = 2, shortlist = 32)
      },
      KMeans.ivfpqOracleSql(dim = 64, nCoarse = 8, nQueries = 8, topK = 5,
        m = 4, kSub = 16, iters = 1, nprobe = 2, shortlist = 32)),

    // ── perceptual image fingerprint: farbfeld decode → 64-bit dHash ───
    // The multimodal column gets the near-dup treatment text already
    // has: REAL pixel decode → 9×8 nearest-neighbor luma grid → 64-bit
    // difference hash. The oracle replays encode→sample→hash from the
    // text (the pixel stream is deterministic in it), so EVERY
    // fingerprint is verified bit-for-bit — the strong arithmetic gate
    // (the q33 pattern; pairs are q103).
    "q102_image_dhash" -> Q(
      (s, dir) => Multimodal.dhash64(
        Multimodal.encodeFarbfeld(Tables.documents(s, dir))),
      Multimodal.dhashOracleSql),

    // ── perceptual image dedup: dHash → banded Hamming pair join ───────
    // The dHash relation fed through the SAME band machinery as q92
    // (fingerprintHammingPairs), vs a brute-force bit_count(xor) oracle
    // — banded == brute force, the q77/q92 contract. maxDist=12 because
    // the fixture's images are synthetic codepoint noise (nearest real
    // pairs at distance ~9); production thresholds are 3–7 with wider
    // bands — see the imageDupPairs scaladoc for the tradeoff.
    "q103_image_dedup" -> Q(
      (s, dir) => Multimodal.imageDupPairs(Tables.documents(s, dir),
        maxDist = 12, nBands = 16),
      Multimodal.imageDupPairsOracleSql(maxDist = 12)),

    // ── IVFPQ train+persist → probe (the full index-build round trip) ──
    // q101's parameters through the production deploy path: codebooks +
    // bucket-partitioned codes written to parquet in-query (the q94
    // write-the-layout-in-query pattern), then probed with the buckets
    // pushed down as partition filters. This is the ONE registered
    // query that still pays training+write per invocation — it prices
    // the index-build job itself, while q100/q101 price the probes.
    // SAME oracle as q101 — the persistence round-trip must be
    // semantically invisible, and the driver gates that end-to-end.
    // Artifacts land under the session scratch root, reaped by its
    // shutdown hook.
    "q105_ann_ivfpq_index" -> Q(
      (s, dir) => {
        val path = Similarity.scratchIndexDir("q105") + "/idx"
        val emb = Tables.embeddings(s, dir)
        Similarity.buildIvfpqIndex(emb, dim = 64, nCoarse = 8,
          m = 4, kSub = 16, iters = 1, path = path)
        Similarity.ivfpqTopKFromIndex(path, emb, dim = 64,
          nQueries = 8, k = 5, m = 4, nprobe = 2, shortlist = 32)
      },
      KMeans.ivfpqOracleSql(dim = 64, nCoarse = 8, nQueries = 8, topK = 5,
        m = 4, kSub = 16, iters = 1, nprobe = 2, shortlist = 32)),

    // ── sketch-shaped rollup, EXACT form (approx twins spec-gated) ─────
    // Distinct users + value percentiles per event type — the rollup a
    // 100 TB pipeline runs with approx_count_distinct/approx_percentile
    // (graft.ext.Approx documents the per-operator opt-in rule). DuckDB
    // can't hash-match sketch internals, so the REGISTERED form is
    // exact; ApproxSpec pins the sketch twins within their configured
    // rsd / rank-accuracy bounds against this same relation.
    "q104_sketch_rollup" -> Q(
      (s, dir) => graft.ext.Approx.sketchRollup(Tables.events(s, dir)),
      """SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS n,
        |  quantile_cont(cents, 0.5) AS p50, quantile_cont(cents, 0.99) AS p99
        |FROM (SELECT event_type, user_id,
        |        cast(round(value * 100) AS BIGINT) AS cents FROM events)
        |GROUP BY event_type""".stripMargin),

    // ── IVF-bucketed top-k (ANN scale path, nprobe=1) ──────────────────
    "q36_ann_ivf" -> Q(
      (s, dir) => Similarity.ivfTopK(Tables.embeddings(s, dir), nCentroids = 8, nQueries = 8, k = 3),
      """WITH e AS (SELECT vec_id, q FROM (SELECT vec_id,
        |    list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
        |    FROM embeddings) WHERE list_dot_product(q, q) > 0),
        |assign AS (
        |  SELECT vec_id, q, cluster FROM (
        |    SELECT e.vec_id, e.q, c.vec_id AS cluster,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(c.q, e.q)
        |          / (sqrt(list_dot_product(c.q, c.q)) * sqrt(list_dot_product(e.q, e.q))) DESC,
        |        c.vec_id) AS arn
        |    FROM e JOIN e c ON c.vec_id < 8)
        |  WHERE arn = 1),
        |scored AS (
        |  SELECT qs.vec_id AS q_id, v.vec_id,
        |    list_dot_product(qs.q, v.q)
        |      / (sqrt(list_dot_product(qs.q, qs.q)) * sqrt(list_dot_product(v.q, v.q))) AS cos
        |  FROM assign qs JOIN assign v
        |    ON qs.vec_id < 8 AND v.cluster = qs.cluster AND v.vec_id != qs.vec_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT q_id, vec_id, cos, cast(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 3""".stripMargin),

    // ── deterministic Lloyd's k-means (IVF codebook training) ──────────
    "q49_kmeans" -> Q(
      (s, dir) => KMeans.cluster(Tables.embeddings(s, dir), k = 8, iters = 2),
      KMeans.clusterOracleSql(k = 8, iters = 2, dim = 64)),

    // ── IVF top-k over the TRAINED codebook (kmeans → assign → probe) ──
    "q50_ann_ivf_kmeans" -> Q(
      (s, dir) => Similarity.ivfTopK(Tables.embeddings(s, dir),
        nCentroids = 8, nQueries = 8, k = 3, nprobe = 1, trainIters = 2),
      KMeans.ivfKmeansOracleSql(k = 8, iters = 2, dim = 64, nQueries = 8, topK = 3)),

    // ── deterministic train/val/test split (salted-hash buckets) ───────
    "q51_hash_split" -> Q(
      (s, dir) => Sampling.assignSplits(Tables.documents(s, dir), "doc_id")
        .select("doc_id", "split"),
      {
        val b = Sampling.bucketSql("doc_id", "split")
        s"""SELECT doc_id,
           |  CASE WHEN $b < 80 THEN 'train'
           |       WHEN $b < 90 THEN 'val' ELSE 'test' END AS split
           |FROM documents""".stripMargin
      }),

    // ── stratified downsampling (per-language rates) ───────────────────
    "q52_stratified_sample" -> Q(
      (s, dir) => Sampling.stratifiedSample(Tables.documents(s, dir),
        "doc_id", "lang", StratRates, defaultPct = 25)
        .select("doc_id", "lang"),
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${Sampling.bucketSql("doc_id", "strat")}
         |    < ${Sampling.rateSql("lang", StratRates, 25)}""".stripMargin),

    // ── audio modality: WAV decode → per-frame energy features ─────────
    // The second real multimodal codec beside farbfeld (q44/q102):
    // canonical RIFF/PCM blobs rendered from the text, parsed back
    // (magic-checked little-endian header), and frame-level energies
    // (Σ sample², exact longs) emitted relationally — the feature shape
    // silence-trimming / activity-window pipelines consume. Oracle
    // replays the sample stream from the text.
    "q111_audio_frames" -> Q(
      (s, dir) => Multimodal.wavFrameEnergies(
        Multimodal.encodeWav(Tables.documents(s, dir)), frameLen = 25),
      Multimodal.wavFramesOracleSql(frameLen = 25)),

    // ── video modality: frame container → every-k frame sampling ───────
    // Completes the image/audio/video triple: multi-frame containers of
    // independently-decodable farbfeld frames, sampled every k frames
    // into per-frame feature rows — blobs stay columnar, only sampled
    // features enter the plan. Oracle replays dims/frame-count/luma
    // from the render rules.
    "q112_video_frame_sample" -> Q(
      (s, dir) => Multimodal.sampleFrames(
        Multimodal.encodeVideo(Tables.documents(s, dir)), everyK = 2),
      Multimodal.frameSampleOracleSql(everyK = 2)),

    // ── binary-column integrity audit (corrupt-blob quarantine) ────────
    // The K3 quarantine discipline applied to media blobs: encode the
    // corpus to real farbfeld, deterministically corrupt two disjoint
    // slices (magic-flip for doc_id%31=7, 8-byte truncation for
    // doc_id%37=11 — q64's injection discipline), then the STRICT
    // decode validator must classify every blob ok/bad_magic/truncated.
    // At 100 TB corrupt blobs are counted and routed, never job-fatal
    // and never silently skipped; the oracle replays the injection rule.
    "q151_media_integrity" -> Q(
      (s, dir) => Multimodal.validateFarbfeld(
        Multimodal.corruptSome(
          Multimodal.encodeFarbfeld(Tables.documents(s, dir)),
          flipMod = 31, flipRes = 7, truncMod = 37, truncRes = 11)),
      """SELECT doc_id,
        |  CASE WHEN doc_id % 31 = 7 THEN 'bad_magic'
        |       WHEN doc_id % 37 = 11 THEN 'truncated'
        |       ELSE 'ok' END AS status
        |FROM documents""".stripMargin),

    // ── perceptual audio fingerprint: WAV decode → 64-bit profile ──────
    // The audio analog of q102's image dHash: 65 equal sample buckets,
    // exact bucket energies, bit i = E(i) < E(i+1) — invariant to
    // amplitude scaling (energies scale by c²), all-integer, so the
    // oracle replays every fingerprint bit from the render rule.
    "q114_audio_fingerprint" -> Q(
      (s, dir) => Multimodal.audioFingerprint64(
        Multimodal.encodeWav(Tables.documents(s, dir))),
      Multimodal.audioFpOracleSql),

    // ── perceptual audio dedup: fingerprints → banded Hamming pairs ────
    // Completes the modality triple (text SimHash q77/q92, image dHash
    // q103, audio here) through the ONE shared banded joiner
    // (Dedup.fingerprintHammingPairs), vs a brute-force bit_count(xor)
    // oracle. maxDist=4/nBands=8 — a tight production-style threshold;
    // the fixture's nearest clips sit at distance 0–4 (132 pairs), so
    // every stage bites.
    "q115_audio_dedup" -> Q(
      (s, dir) => Multimodal.audioDupPairs(Tables.documents(s, dir),
        maxDist = 4, nBands = 8),
      Multimodal.audioDupPairsOracleSql(maxDist = 4)),

    // ── BPE vocabulary training (merge table after 30 rounds) ──────────
    // The canonical subword-vocab induction, as iterative relational
    // rounds over the WORD HISTOGRAM (per-round cost is vocab-sized,
    // not corpus-sized). Driver-verified end to end: the oracle unrolls
    // every training round into CTEs — pair histogram, (freq desc,
    // left, right) argmax, and the merge applied as a sentinel-
    // delimited string replace (see TextAnalysis.bpeTrainOracleSql for
    // why replace IS the greedy scan) — the ivfpqOracleSql/PageRank
    // round-unrolling discipline. NaiveCrossCheckSpec additionally pins
    // the table against a textbook pure-Scala BPE.
    "q109_bpe_train" -> Q((s, dir) =>
      TextAnalysis.bpeTrain(Tables.documents(s, dir), nMerges = 30),
      TextAnalysis.bpeTrainOracleSql(nMerges = 30)),

    // ── BPE encode: segment the corpus with the learned merges ─────────
    // Segment every document with the session-cached merge table
    // (sessionBpeMerges — the vocab artifact is trained once per
    // session like the ANN codebooks; q109 prices training itself) —
    // a pure narrow compiled kernel, zero exchanges. The oracle
    // re-derives the merge table via the same unrolled CTEs and
    // replays segmentation per word in rank order; the naive reference
    // additionally pins exact pieces and the lossless-reconstruction
    // law (NaiveCrossCheckSpec).
    "q110_bpe_segment" -> Q((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.bpeSegment(docs,
        TextAnalysis.sessionBpeMerges(docs, dir, nMerges = 30))
    }, TextAnalysis.bpeSegmentOracleSql(nMerges = 30)),

    // ── tokenizer-fit rollup: per-language BPE compression stats ───────
    // The vocabulary-evaluation step after training a tokenizer: pieces
    // vs raw tokens vs chars per language, and the pieces-per-token
    // compression ratio — the number that says how well the learned
    // vocab fits each language's distribution (a vocab trained on
    // mixed text compresses dominant languages better). Exact integer
    // sums + one final division; oracle chains the full segmentation
    // replay into the rollup.
    "q119_bpe_stats" -> Q((s, dir) => {
      val docs = Tables.documents(s, dir)
      val seg = TextAnalysis.bpeSegment(docs,
        TextAnalysis.sessionBpeMerges(docs, dir, nMerges = 30))
      docs.select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("toks"),
          length(col("text")).cast("long").as("chars_"))
        .join(seg.select(col("doc_id"), col("n_pieces")), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_pieces")).as("pieces"),
          sum(col("toks")).as("tokens"),
          sum(col("chars_")).as("chars"))
        .withColumn("pieces_per_token",
          col("pieces").cast("double") / col("tokens"))
    }, TextAnalysis.bpeStatsOracleSql(nMerges = 30)),

    // ── BPE token-ID surface (vocab → dense ids → encode) ──────────────
    // The deployment step q110 stops short of: pieces are strings, but
    // what reaches a model is IDS. Vocabulary = every distinct piece
    // ranked by corpus frequency into contiguous 0-based ids
    // (metadata-sized: |alphabet| + nMerges entries, broadcast); encode
    // maps each doc's pieces through it in order. The
    // decode(encode(x)) == x law (modulo the splitter's spaces) is
    // spec-pinned in TextAnalysisSpec; the oracle replays segmentation,
    // the frequency ranking, and the positional re-stitch.
    "q121_bpe_encode_ids" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.bpeEncodeIds(docs,
          TextAnalysis.sessionBpeMerges(docs, dir, nMerges = 30))
      },
      TextAnalysis.bpeEncodeIdsOracleSql(nMerges = 30)),

    // ── BPE tokenizer ARTIFACT round trip (deploy path) ────────────────
    // The q105 discipline for the tokenizer: q109 prices training,
    // q110/q121 consume session-cached merges; this query prices the
    // ARTIFACT round trip a deployment actually runs — persist the
    // trained model (merges + frequency-ranked vocab, two metadata-
    // sized parquet tables) and encode FROM THE LOADED ARTIFACT, no
    // training work in the consumer at all. Same oracle as q121: the
    // persistence must be semantically invisible, and the driver gates
    // that end-to-end. Artifacts land under the session scratch root
    // (shutdown-reaped).
    "q127_bpe_persisted" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val path = Similarity.scratchIndexDir("q127") + "/bpe"
        val merges = TextAnalysis.sessionBpeMerges(docs, dir, nMerges = 30)
        TextAnalysis.saveBpeModel(s, merges,
          TextAnalysis.bpeVocab(TextAnalysis.bpeSegment(docs, merges)), path)
        TextAnalysis.bpeEncodeIdsFromModel(docs, path)
      },
      TextAnalysis.bpeEncodeIdsOracleSql(nMerges = 30)),

    // ── z-order LAYOUT write + min/max-pruned box probe ────────────────
    // q79 computes z inline; this prices the LAYOUT itself (the q94/
    // q105 write-the-artifact-in-query pattern): lineitem laid out
    // range-partitioned-and-sorted by z (8 files), then the box query
    // answered FROM the layout — z-range prefilter on the PERSISTED z
    // column (a plain comparison parquet pushes down to row-group
    // min/max stats, ZOrderSpec asserts the PushedFilters) + exact
    // refilter. Same oracle as q79: the layout round trip must be
    // semantically invisible.
    "q128_zorder_layout" -> Q(
      (s, dir) => {
        val path = Similarity.scratchIndexDir("q128") + "/zlayout"
        val x = col("l_partkey").bitwiseAND(lit(65535L))
        val y = col("l_suppkey").bitwiseAND(lit(65535L))
        graft.util.ZOrder.writeZOrdered(
          Tables.lineitem(s, dir).select(col("l_orderkey"),
            col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
          x, y, path, files = 8)
        val laid = s.read.parquet(path)
        laid.where(col("z").between(
            lit(graft.util.ZOrder.zOf(100L, 10L)),
            lit(graft.util.ZOrder.zOf(300L, 50L))))
          .where(x.between(100L, 300L) && y.between(10L, 50L))
          .select(col("l_orderkey"), col("l_linenumber"), col("z"))
      },
      s"""SELECT l_orderkey, l_linenumber,
         |  cast(${graft.util.ZOrder.zValueSql("(l_partkey & 65535)", "(l_suppkey & 65535)")} AS BIGINT) AS z
         |FROM lineitem
         |WHERE (l_partkey & 65535) BETWEEN 100 AND 300
         |  AND (l_suppkey & 65535) BETWEEN 10 AND 50""".stripMargin),

    // ── incremental prep: the continuous-ingest composition ────────────
    // One NEW batch (residue-3 docs) pushed through the full prep gate
    // chain against the EXISTING corpus (the rest): quality+language
    // gate (q37/q38) → exact+near dedup against the corpus (q73) →
    // eval-set decontamination (q54) → train split (q51) → per-language
    // token budget (q117). The batch form of what
    // StreamIngest.ingestPrep runs per micro-batch (replay spec proves
    // stream == batch and corpus-probed-never-rewritten); the oracle
    // chains the q73 + q108 fragments over ONE shared shingle base.
    "q122_incremental_prep" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Prep.prepBatch(
          docs.where(col("doc_id") % 7 === 3),
          Some(docs.where(col("doc_id") % 7 =!= 3)),
          docs.where(col("doc_id") % 97 === 0),
          MixBudgets, MixDefaultBudget)
          .select(col("doc_id"), col("lang_guess"), col("n_tokens"))
      },
      shingleBase3 + minhashBandsSql +
        s""", q AS (SELECT doc_id, cast(len(t) AS BIGINT) AS n_tokens,
           |    (cast(length(text) - (len(t) - 1) AS DOUBLE) / len(t)) * 0.1
           |      + cast($stopSumSql AS DOUBLE) / len(t) AS quality_score
           |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t
           |        FROM documents WHERE doc_id % 7 = 3)),
           |sc AS (SELECT doc_id, text, $langScoresSql
           |       FROM documents WHERE doc_id % 7 = 3),
           |lg AS (SELECT doc_id, text, $langGuessCaseSql AS lang_guess FROM sc),
           |scored AS (SELECT lg.doc_id, lg.text, lg.lang_guess, q.n_tokens
           |  FROM lg JOIN q USING (doc_id)
           |  WHERE q.quality_score >= 0.55 AND q.n_tokens >= 20),
           |corphash AS (SELECT DISTINCT md5(text) AS h FROM documents
           |             WHERE doc_id % 7 <> 3),
           |exact_kept AS (SELECT * FROM scored
           |               WHERE md5(text) NOT IN (SELECT h FROM corphash)),
           |coll AS (SELECT DISTINCT a.doc_id
           |         FROM bands a JOIN bands b USING (band, m0, m1)
           |         WHERE a.doc_id IN (SELECT doc_id FROM exact_kept)
           |           AND b.doc_id % 7 <> 3),
           |dd AS (SELECT * FROM exact_kept
           |       WHERE doc_id NOT IN (SELECT doc_id FROM coll)),
           |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
           |contam AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (sh)
           |           WHERE s.doc_id IN (SELECT doc_id FROM dd)),
           |clean AS (SELECT * FROM dd
           |          WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
           |tr AS (SELECT * FROM clean
           |       WHERE ${Sampling.bucketSql("doc_id", "split")} < 80),
           |mixed AS (SELECT doc_id, lang_guess, n_tokens,
           |    ${Sampling.cumTokensSql("doc_id", "lang_guess", "n_tokens", "mix")} AS cum
           |  FROM tr)
           |SELECT doc_id, lang_guess, n_tokens FROM mixed
           |WHERE cum <= ${Sampling.budgetSql("lang_guess", MixBudgets, MixDefaultBudget)}""".stripMargin),

    // ── proportional data-mixing (water-filling domain reweighting) ────
    // The recipe form mixing is actually specified in — target domain
    // PROPORTIONS, not absolute token budgets (q117's input): the
    // largest corpus honoring 5:3:2 en:de:zh from the available data is
    // the water-filling solution T = min_d floor(avail_d·W/w_d),
    // budget_d = floor(w_d·T/W) — exact integer arithmetic, so the
    // ORACLE REDERIVES the budgets in SQL instead of trusting the
    // driver's numbers, and the hash compare verifies the optimization
    // itself, not just the prefix cut. Unlisted domains drop (the
    // recipe defines the corpus).
    "q123_mix_proportions" -> Q(
      (s, dir) => {
        val withTok = Tables.documents(s, dir).select(col("doc_id"),
          col("lang"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
        Sampling.sampleToProportions(withTok, "doc_id", "lang", "n_tokens",
          MixWeights)
      },
      {
        val tokSrc = "SELECT doc_id, lang, cast(len(string_split(text, ' ')) " +
          "AS BIGINT) AS n_tokens FROM documents"
        val domList = MixWeights.map(w => s"'${w._1}'").mkString(", ")
        s"""WITH ${Sampling.proportionBudgetCtes(tokSrc, "lang", "n_tokens", MixWeights)},
           |src AS (SELECT * FROM ($tokSrc) WHERE lang IN ($domList)),
           |mixed AS (SELECT doc_id, lang, n_tokens,
           |    ${Sampling.cumTokensSql("doc_id", "lang", "n_tokens", "mix")} AS cum
           |  FROM src)
           |SELECT m.doc_id, m.lang, m.n_tokens FROM mixed m
           |JOIN budget b ON m.lang = b.domain
           |WHERE m.cum <= b.b""".stripMargin
      }),

    // ── deterministic global shuffle-shard (training order) ────────────
    // The last step before a training reader consumes the corpus:
    // shard in [0, nShards) + dense within-shard position, both pure
    // functions of doc_id over two independent salted hash streams —
    // the same shuffled order on any engine, any partitioning, any
    // subset, where an engine-native random shuffle is none of those.
    // One window exchange on shard = the layout write's partitioning.
    "q124_shuffle_shards" -> Q(
      (s, dir) => Sampling.shuffleShards(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", nShards = 8),
      s"""SELECT doc_id, lang,
         |  ${Sampling.rowHashSql("doc_id", "shard")} % 8 AS shard,
         |  row_number() OVER (
         |    PARTITION BY ${Sampling.rowHashSql("doc_id", "shard")} % 8
         |    ORDER BY ${Sampling.rowHashSql("doc_id", "shard:order")}, doc_id) - 1
         |    AS pos
         |FROM documents""".stripMargin),

    // ── cross-modality dedup (duplicate in EITHER modality merges) ─────
    // An audio-caption pair corpus dedups on BOTH channels: a near-dup
    // clip (perceptual audio fingerprint, q115's generator at its tight
    // production threshold) OR a near-dup caption (64-bit SimHash,
    // q92's generator) makes two items the same content, so the pair
    // sources UNION before clustering — one connected-components pass
    // over the merged edge relation, longest caption survives (q57's
    // policy). The oracle unions both brute-force pair sources
    // (prefixed simhash CTEs compose beside the audio chain) and
    // replays closure + survivor, so the driver verifies the
    // cross-modal merge end-to-end. (The image-dHash source composes
    // identically via Multimodal.dhashCtesSql, but its fixture
    // threshold — Hamming 12 of 64, hence 4-bit bands — carries a
    // structural candidate volume that would make the composite the
    // registry's heaviest query; the audio fingerprint's 8-bit bands
    // give the same cross-modal semantics at production economics.)
    "q126_multimodal_dedup" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val audioPairs = Multimodal.audioDupPairs(docs, maxDist = 4, nBands = 8)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        val txtPairs = Dedup.simhashHammingPairs(docs, maxDist = 3,
          bits = 64, nBands = 4)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        Dedup.clusterPairsBy(docs, audioPairs.unionByName(txtPairs).distinct(),
          length(col("text")))
      },
      s"""WITH RECURSIVE ${Multimodal.audioFpCtesSql},
         |${simhashCtesFor(64, "t_")},
         |ip AS (SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.fp, b.fp)) <= 4),
         |tp AS (SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM t_s a JOIN t_s b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |qual AS (SELECT * FROM ip UNION SELECT * FROM tp),
         |sym AS (SELECT a, b FROM qual UNION ALL SELECT b, a FROM qual),
         |reach(a, b) AS (
         |  SELECT a, b FROM sym
         |  UNION
         |  SELECT r.a, y.b FROM reach r JOIN sym y ON r.b = y.a),
         |canon AS (SELECT a AS id, least(a, min(b)) AS canonical
         |          FROM reach GROUP BY a),
         |lab AS (SELECT d.doc_id, coalesce(c.canonical, d.doc_id) AS cl,
         |               length(d.text) AS q
         |        FROM documents d LEFT JOIN canon c ON d.doc_id = c.id),
         |surv AS (SELECT cl, doc_id AS canonical_id FROM (
         |  SELECT cl, doc_id,
         |         row_number() OVER (PARTITION BY cl ORDER BY q DESC, doc_id) AS rn
         |  FROM lab) WHERE rn = 1)
         |SELECT l.doc_id, z.canonical_id,
         |       count(*) OVER (PARTITION BY l.cl) AS cluster_size
         |FROM lab l JOIN surv z USING (cl)""".stripMargin),

    // ── contamination audit report (the finding, not just the drop) ────
    // q54 silently drops contaminated training docs; a real eval-set
    // owner needs the REPORT: per eval document, how many corpus docs
    // share an n-gram with it and how many of its shingles leak —
    // which benchmark items are compromised and how badly. Broadcast
    // eval shingles, corpus-side explode, aggregate over match-volume
    // rows only.
    "q125_contamination_report" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.contaminationReport(docs, docs.where(col("doc_id") % 97 === 0), n = 3)
      },
      shingleBase3 +
        """, ev AS (SELECT doc_id AS eval_id, sh FROM sh WHERE doc_id % 97 = 0),
          |hits AS (SELECT e.eval_id, s.doc_id, s.sh FROM sh s
          |         JOIN ev e USING (sh) WHERE s.doc_id <> e.eval_id)
          |SELECT eval_id, count(DISTINCT doc_id) AS n_contaminated_docs,
          |       count(DISTINCT sh) AS n_leaked_shingles
          |FROM hits GROUP BY eval_id""".stripMargin),

    // ── embedding near-dup SURVIVOR selection (CC over cosine pairs) ───
    // The "keep one representative per near-dup cluster" step on the
    // EMBEDDING side: LSH-prefiltered cosine pairs (q46's scale path,
    // proven == brute force by its oracle) → connected components →
    // highest-energy member survives (‖q‖² exact-integer quality,
    // smallest id breaks ties) — Dedup.clusterPairsBy verbatim, the
    // q57 policy machinery on a different pair source, exactly as its
    // scaladoc promises. Oracle: brute-force pairs + WITH RECURSIVE
    // closure + the same max-by replay.
    "q118_embed_dedup_survivor" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val pairs = Similarity.cosineDupPairs(emb, tau = 0.40, dim = 64)
          .select(col("vec_a").as("a"), col("vec_b").as("b"))
        val e = Similarity.prepared(emb)
        Dedup.clusterPairsBy(
          e.select(col("vec_id").as("doc_id"), col("q")),
          pairs, Similarity.dotL(col("q"), col("q")))
          .select(col("doc_id").as("vec_id"), col("canonical_id"),
            col("cluster_size"))
      },
      """WITH RECURSIVE e AS (SELECT vec_id,
        |  list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
        |  FROM embeddings),
        |qual AS (SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.q, b.q)
        |    / (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))) >= 0.40),
        |sym AS (SELECT a, b FROM qual UNION ALL SELECT b, a FROM qual),
        |reach(a, b) AS (SELECT a, b FROM sym
        |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
        |canon AS (SELECT a AS id, least(a, min(b)) AS canonical FROM reach GROUP BY a),
        |lab AS (SELECT em.vec_id, coalesce(c.canonical, em.vec_id) AS cl,
        |        list_dot_product(em.q, em.q) AS qq
        |  FROM e em LEFT JOIN canon c ON em.vec_id = c.id),
        |surv AS (SELECT cl, vec_id AS canonical_id FROM (
        |  SELECT cl, vec_id, row_number() OVER (PARTITION BY cl
        |      ORDER BY qq DESC, vec_id) AS rn
        |  FROM lab) WHERE rn = 1)
        |SELECT l.vec_id, s.canonical_id,
        |  count(*) OVER (PARTITION BY l.cl) AS cluster_size
        |FROM lab l JOIN surv s USING (cl)""".stripMargin),

    // ── the fuzzy-dedup END-TO-END composite (near-dup analog of q108) ─
    // The full near-dedup chain a training-data run actually executes,
    // as ONE registered query: MinHash/LSH banding candidates (q32's
    // generator) → exact Jaccard verify on candidates only (q31's
    // rescore discipline, via Dedup.jaccardVerifyPairs) → connected
    // components (q45) → longest-text survivor policy (q57) → the
    // REWRITTEN CORPUS: surviving documents with per-cluster audit
    // counts. Every fragment is individually verified; this query
    // verifies their COMPOSITION — the oracle chains the same generated
    // fragments (bands → verify joins → WITH RECURSIVE closure → max-by
    // survivor → corpus emit), so the driver hash-verifies the whole
    // pipeline end-to-end including the emitted text.
    "q120_fuzzy_dedup_corpus" -> Q(
      (s, dir) => {
        val clusters = fuzzyClusters(s, dir)
        Tables.documents(s, dir).join(
          clusters.where(col("doc_id") === col("canonical_id"))
            .select(col("doc_id"), col("cluster_size")),
          "doc_id")
          .select(col("doc_id"), col("cluster_size"),
            (col("cluster_size") - 1).as("n_dups_removed"), col("text"))
      },
      fuzzyClusterCtes +
        """
          |SELECT d.doc_id, z.cluster_size,
          |       z.cluster_size - 1 AS n_dups_removed, d.text
          |FROM (SELECT s2.canonical_id, si.cluster_size
          |      FROM surv s2 JOIN sizes si USING (cl)) z
          |JOIN documents d ON d.doc_id = z.canonical_id""".stripMargin),

    // ── leakage-free split assignment (split by CLUSTER, not by doc) ───
    // Hash-splitting by doc_id puts two near-duplicate documents in
    // different splits — the classic train/test leakage bug: the model
    // sees the test set's near-copy during training. The fix every
    // careful pipeline ships: assign the split from the near-dup
    // CLUSTER representative, so a whole cluster lands in one split.
    // Composition of verified fragments: q120's candidate→verify→CC→
    // survivor chain labels every doc with its canonical_id; q51's
    // bucket arithmetic then splits ON THE CANONICAL. The oracle chains
    // the same fragments and rederives the bucket CASE, so the driver
    // verifies the leakage guarantee itself (equal canonical ⇒ equal
    // split, by construction of the arithmetic).
    "q135_leakfree_split" -> Q(
      (s, dir) => Sampling.assignSplits(
        fuzzyClusters(s, dir).select(col("doc_id"), col("canonical_id")),
        "canonical_id"),
      fuzzyClusterCtes +
        s"""
           |SELECT l.doc_id, s.canonical_id,
           |  CASE WHEN ${Sampling.bucketSql("s.canonical_id", "split")} < 80 THEN 'train'
           |       WHEN ${Sampling.bucketSql("s.canonical_id", "split")} < 90 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM lab l JOIN surv s USING (cl)""".stripMargin),

    // ── the END-TO-END data-prep composition (the engine's point) ──────
    // Every prep stage, composed into ONE verified query: quality +
    // language gate → exact first-wins dedup → eval decontamination →
    // train-split assignment → per-language cap. Each stage is an
    // already-verified operator (q38/q37, q30, q54, q51, q106); the
    // composition is what a user's real pipeline runs, and the oracle
    // chains the SAME generated fragments, so the driver hash-verifies
    // the whole chain end-to-end.
    "q108_prep_pipeline" -> Q(
      (s, dir) => prepMixed(s, dir),
      s"""WITH $prepMixedCtes
         |SELECT doc_id, lang_guess, n_tokens FROM prepmixed""".stripMargin),

    // ── maximal exact shared token spans (substring-dedup primitive) ───
    // The ≥k-token repeated-substring detector (distributed fingerprint
    // join + diagonal islands instead of a suffix array): positioned
    // token 8-grams, df-capped, hash-joined, merged into maximal spans
    // per (pair, diagonal). Oracle replays gram hashing, the cap, the
    // join, and the gaps-and-islands merge.
    "q107_shared_spans" -> Q(
      (s, dir) => TextAnalysis.sharedSpans(Tables.documents(s, dir), k = 8),
      s"""WITH ${sharedSpansCtes(k = 8)}
         |SELECT doc_a, doc_b, start_a, start_b, len_tokens FROM spans""".stripMargin),

    // ── exact substring-dedup REWRITE (consumes q107's spans) ──────────
    // The step that actually removes the duplicated text: q107 finds
    // maximal shared spans, this cuts every higher-doc occurrence
    // (first-wins by doc_id) and re-joins the survivors — emitting the
    // rewritten corpus plus an audit count per doc. The oracle chains
    // the SAME span CTEs with the cut arithmetic (covered positions via
    // an interval join, survivors re-stitched in position order), so
    // the driver hash-verifies detection AND rewrite end-to-end.
    "q113_span_dedup_rewrite" -> Q(
      // reads the session span store (round-16): the rewrite is one
      // per-doc interval groupBy + a doc-keyed join + a positional
      // filter HOF downstream of q107's spans — not a reason to re-mine
      // them per query. q107 stays live as the priced mining arm.
      (s, dir) => TextAnalysis.cutSpans(Tables.documents(s, dir),
        sharedSpans8(s, dir)),
      s"""WITH ${sharedSpansCtes(k = 8)},
         |cuts AS (SELECT doc_b AS doc_id, start_b AS s,
         |    start_b + len_tokens AS e FROM spans),
         |tpos AS (SELECT doc_id, t[i] AS tok, i - 1 AS pos
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks)),
         |cutpos AS (SELECT DISTINCT tp.doc_id, tp.pos FROM tpos tp
         |  JOIN cuts c ON tp.doc_id = c.doc_id
         |    AND tp.pos >= c.s AND tp.pos < c.e),
         |kept AS (SELECT tp.doc_id, tp.tok, tp.pos FROM tpos tp
         |  LEFT JOIN cutpos cp ON tp.doc_id = cp.doc_id AND tp.pos = cp.pos
         |  WHERE cp.pos IS NULL),
         |stitched AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_kept,
         |    string_agg(tok, ' ' ORDER BY pos) AS text_clean
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id,
         |  cast(len(t.t) - coalesce(st.n_kept, 0) AS BIGINT) AS n_removed,
         |  coalesce(st.text_clean, '') AS text_clean
         |FROM toks t LEFT JOIN stitched st USING (doc_id)""".stripMargin),

    // ── per-group cap: at most k docs per language, hash-deterministic ─
    // The exact-k class-balancing cap (rate samplers cap only in
    // expectation); survivors = first k by salted-hash order, stable
    // under any partitioning/engine. Oracle replays the identical hash
    // ranking.
    "q106_group_cap" -> Q(
      (s, dir) => Sampling.capPerGroup(Tables.documents(s, dir),
        "doc_id", "lang", k = 40).select("doc_id", "lang"),
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
         |      ORDER BY ${Sampling.rowHashSql("doc_id", "cap")}, doc_id) AS rk
         |  FROM documents) WHERE rk <= 40""".stripMargin),

    // ── token-budget mixture sampling (data-mixing) ────────────────────
    // The pretraining data-mixing step: each language sampled down to a
    // TOKEN budget (corpus recipes are specified in tokens per domain,
    // not document counts — q106 caps rows, this caps tokens). Rows
    // take the deterministic salted-hash order, a per-domain running
    // sum accumulates, and the maximal prefix within budget survives.
    // Oracle replays the identical hash order and window arithmetic.
    "q117_token_budget_mix" -> Q(
      (s, dir) => {
        val withTok = Tables.documents(s, dir).select(col("doc_id"),
          col("lang"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
        Sampling.sampleToTokenBudget(withTok, "doc_id", "lang", "n_tokens",
          MixBudgets, MixDefaultBudget)
      },
      s"""SELECT doc_id, lang, n_tokens FROM (
         |  SELECT doc_id, lang, n_tokens,
         |    ${Sampling.cumTokensSql("doc_id", "lang", "n_tokens", "mix")} AS cum
         |  FROM (SELECT doc_id, lang,
         |          cast(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |        FROM documents))
         |WHERE cum <= ${Sampling.budgetSql("lang", MixBudgets, MixDefaultBudget)}""".stripMargin),

    // ── sequence packing (fixed-token-budget training samples) ─────────
    "q53_seq_pack" -> Q(
      (s, dir) => SeqPack.pack(Tables.documents(s, dir), "doc_id", "text",
        shards = 8, seqLen = 256),
      SeqPack.packOracleSql("documents", "doc_id", "text",
        shards = 8, seqLen = 256)),

    // ── materialized packed training sequences (the last packing mile) ─
    // q53 addresses documents into sequences; this EMITS the sequences —
    // per (shard, seq_id) the concatenated token window, documents cut
    // across boundaries, every non-final sequence exactly full. Same
    // salt as q53, so the two queries share their layout arithmetic.
    // Fragments (≤ ⌈n_tok/seqLen⌉+1 per doc), not tokens, ride the
    // assembly exchange — the scale-decisive choice at a 4k context.
    "q149_pack_sequences" -> Q(
      (s, dir) => SeqPack.packSequences(Tables.documents(s, dir), "doc_id",
        "text", shards = 8, seqLen = 256),
      SeqPack.packSequencesOracleSql("documents", "doc_id", "text",
        shards = 8, seqLen = 256)),

    // ── deterministic inspection sample (the release "eyeball" sheet) ──
    // Every dataset release ships a human-readable sample: k docs per
    // (lang, split) stratum picked by the q106 deterministic-hash cap
    // (reproducible — two releases of the same corpus show the same
    // docs), with an 80-char excerpt instead of full text. Composes
    // q51's split buckets with capPerGroup on a composite stratum key;
    // the oracle replays bucket, rank window, and excerpt.
    "q150_sample_inspection" -> Q(
      (s, dir) => {
        val withSplit = Sampling.assignSplits(Tables.documents(s, dir), "doc_id")
          .withColumn("stratum", concat(col("lang"), lit(":"), col("split")))
        Sampling.capPerGroup(withSplit, "doc_id", "stratum", k = 2)
          .select(col("doc_id"), col("lang"), col("split"),
            org.apache.spark.sql.functions.substring(col("text"), 1, 80)
              .as("excerpt"))
      },
      {
        val b = Sampling.bucketSql("doc_id", "split")
        s"""WITH ws AS (SELECT doc_id, lang, text,
           |    CASE WHEN $b < 80 THEN 'train'
           |         WHEN $b < 90 THEN 'val' ELSE 'test' END AS split
           |  FROM documents),
           |rk AS (SELECT doc_id, lang, split, text,
           |    row_number() OVER (PARTITION BY lang || ':' || split
           |      ORDER BY ${Sampling.rowHashSql("doc_id", "cap")}, doc_id) AS rk
           |  FROM ws)
           |SELECT doc_id, lang, split, substr(text, 1, 80) AS excerpt
           |FROM rk WHERE rk <= 2""".stripMargin
      }),

    // ── eval-set decontamination (benchmark-leakage guard) ─────────────
    // pseudo-eval set: every 97th document; any training doc sharing a
    // word 3-gram with it is dropped (eval docs drop by definition)
    "q54_decontaminate" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.decontaminate(docs, docs.where(col("doc_id") % 97 === 0), n = 3)
          .select("doc_id", "lang")
      },
      decontaminateSql),

    // ── bloom-filter decontamination == broadcast-dictionary path ──────
    // Same oracle as q54: the bloom prefilter + exact confirm join must
    // drop exactly the same documents (false positives removed by the
    // confirm, false negatives impossible by bloom contract).
    "q61_decontaminate_bloom" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.decontaminateBloom(docs, docs.where(col("doc_id") % 97 === 0), n = 3,
          expectedItems = 100000L, numBits = 800000L)
          .select("doc_id", "lang")
      },
      decontaminateSql),

    // ── as-of join (point-in-time-correct enrichment) ──────────────────
    // Latest per-user marker event at-or-before each event's timestamp;
    // DuckDB's native ASOF LEFT JOIN is the oracle, so the union+window
    // formulation's inclusive backward semantics are verified exactly
    // (matched rows AND the 15%% of rows before any marker → NULLs).
    "q60_asof_join" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
        val markers = Tables.events(s, dir)
          .where(col("event_id") % 10 === 0)
          .groupBy(col("user_id"), col("ts"))
          .agg(org.apache.spark.sql.functions.max(col("event_id")).as("mark_id"))
          .select(col("user_id"), col("ts").as("mark_ts"), col("mark_id"))
        graft.ext.AsOfJoin.backward(ev, markers, Seq("user_id"), "ts", "mark_ts")
          .select("event_id", "user_id", "mark_id", "mark_ts")
      },
      """WITH m AS (SELECT user_id, ts AS mark_ts, max(event_id) AS mark_id
        |           FROM events WHERE event_id % 10 = 0 GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, m.mark_id, m.mark_ts
        |FROM events l ASOF LEFT JOIN m
        |  ON l.user_id = m.user_id AND l.ts >= m.mark_ts""".stripMargin),

    // ── intra-document repetition score (Gopher-style quality filter) ──
    "q55_repetition" -> Q(
      (s, dir) => TextAnalysis.repetitionScore(Tables.documents(s, dir), n = 2),
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
        |      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |            FROM toks WHERE len(t) >= 2)),
        |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
        |agg AS (SELECT doc_id, cast(sum(c) AS BIGINT) AS n_grams,
        |               cast(max(c) AS BIGINT) AS top_rep
        |        FROM c GROUP BY doc_id)
        |SELECT doc_id, n_grams, top_rep,
        |       cast(top_rep AS DOUBLE) / n_grams AS rep_ratio
        |FROM agg""".stripMargin),

    // ── per-language token-count percentiles (quality dashboards) ──────
    // exact interpolated percentiles: both engines use the (n-1)*p
    // rank-interpolation definition, so integer inputs give identical
    // doubles
    "q56_length_percentiles" -> Q(
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("lang"),
            org.apache.spark.sql.functions.size(
              org.apache.spark.sql.functions.split(col("text"), " ")).cast("long").as("n_tok"))
        toks.groupBy(col("lang")).agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_docs"),
          org.apache.spark.sql.functions.expr("percentile(n_tok, 0.5)").as("p50"),
          org.apache.spark.sql.functions.expr("percentile(n_tok, 0.9)").as("p90"),
          org.apache.spark.sql.functions.expr("percentile(n_tok, 0.99)").as("p99"))
      },
      """SELECT lang, count(*) AS n_docs,
        |  quantile_cont(n_tok, 0.5) AS p50,
        |  quantile_cont(n_tok, 0.9) AS p90,
        |  quantile_cont(n_tok, 0.99) AS p99
        |FROM (SELECT lang, cast(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |      FROM documents)
        |GROUP BY lang""".stripMargin),

    // ── language ID (marker-word heuristic) ────────────────────────────
    "q37_lang_id" -> Q(
      (s, dir) => TextAnalysis.langId(Tables.documents(s, dir)),
      {
        def occ(w: String) =
          s"((length(text) - length(replace(text, '$w', ''))) / ${w.length})"
        val scores = TextAnalysis.LangMarkers.map { case (lang, ws) =>
          s"${ws.map(occ).mkString(" + ")} AS sc_$lang"
        }.mkString(", ")
        // fold argmax with first-listed-wins tie-break, mirroring the Scala fold
        val langs = TextAnalysis.LangMarkers.map(_._1)
        val guess = langs.tail.foldLeft((s"'${langs.head}'", s"sc_${langs.head}")) {
          case ((bl, bs), lang) =>
            (s"(CASE WHEN sc_$lang > $bs THEN '$lang' ELSE $bl END)",
              s"greatest($bs, sc_$lang)")
        }._1
        s"WITH sc AS (SELECT doc_id, lang, text, $scores FROM documents)\n" +
          s"SELECT doc_id, $guess AS lang_guess, lang, ($guess = lang) AS is_match FROM sc"
      }),

    // ── quality scoring ────────────────────────────────────────────────
    "q38_quality_score" -> Q(
      (s, dir) => TextAnalysis.qualityScore(Tables.documents(s, dir)),
      {
        val stopSum = TextAnalysis.Stopwords
          .map(w => s"len(list_filter(t, x -> x = '$w'))").mkString(" + ")
        s"""WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
           |m AS (SELECT doc_id, cast(len(t) AS BIGINT) AS n_tokens,
           |  cast(length(text) - (len(t) - 1) AS BIGINT) AS sum_len,
           |  cast($stopSum AS BIGINT) AS n_stop FROM toks)
           |SELECT doc_id, n_tokens,
           |  cast(sum_len AS DOUBLE) / n_tokens AS mean_token_len,
           |  cast(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           |  (cast(sum_len AS DOUBLE) / n_tokens) * 0.1
           |    + cast(n_stop AS DOUBLE) / n_tokens AS quality_score
           |FROM m""".stripMargin
      }),

    // ── token counting (whitespace / regex / distinct) ─────────────────
    "q39_token_count" -> Q(
      (s, dir) => TextAnalysis.tokenCounts(Tables.documents(s, dir)),
      """SELECT doc_id,
        |  cast(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
        |  cast(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re,
        |  cast(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
        |FROM documents""".stripMargin),

    // ── rolling-hash document fingerprint ──────────────────────────────
    "q40_fingerprint" -> Q(
      (s, dir) => TextAnalysis.fingerprint(Tables.documents(s, dir)),
      {
        val terms = TextAnalysis.FpPowers.zipWithIndex.map { case (p, j) =>
          s"cast(ascii(substr(text, i + $j, 1)) AS BIGINT) * $p"
        }.mkString(" + ")
        s"""WITH g AS (SELECT doc_id, (($terms) % ${TextAnalysis.FpMod}) AS h
           |  FROM (SELECT doc_id, text,
           |          unnest(range(1, length(text) - ${TextAnalysis.FpGram - 2})) AS i
           |        FROM documents))
           |SELECT doc_id, min(h) AS fp_min, count(DISTINCT h) AS n_grams
           |FROM g GROUP BY doc_id""".stripMargin
      }),

    // ── tumbling event-time windows ────────────────────────────────────
    "q41_window_tumbling" -> Q(
      (s, dir) => EventWindows.tumbling(Tables.events(s, dir)),
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS wstart, event_type,
        |  count(*) AS n,
        |  cast(sum(cast(round(value*100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY 1, 2""".stripMargin),

    // ── sliding event-time windows (1h every 30min) ────────────────────
    "q42_window_sliding" -> Q(
      (s, dir) => EventWindows.sliding(Tables.events(s, dir)),
      """SELECT make_timestamp((epoch_us(date_trunc('microseconds', ts)) // 1800000000 - off)
        |                      * 1800000000) AS wstart,
        |  count(*) AS n,
        |  cast(sum(cast(round(value*100) AS BIGINT)) AS BIGINT) AS cents
        |FROM (SELECT ts, value, unnest([0, 1]) AS off FROM events)
        |GROUP BY 1""".stripMargin),

    // ── session windows (30-minute gap, per user) ──────────────────────
    "q43_window_session" -> Q(
      (s, dir) => EventWindows.sessions(Tables.events(s, dir)),
      """WITH e AS (SELECT user_id,
        |    epoch_us(date_trunc('microseconds', ts)) AS tus,
        |    cast(round(value*100) AS BIGINT) AS cents
        |  FROM events),
        |s AS (SELECT *,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |           OR tus - lag(tus) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tus) AS sid FROM s)
        |SELECT user_id,
        |  make_timestamp(min(tus)) AS session_start,
        |  make_timestamp(max(tus) + 1800000000) AS session_end,
        |  count(*) AS n, cast(sum(cents) AS BIGINT) AS cents
        |FROM g GROUP BY user_id, sid""".stripMargin),

    // ── event-time-bounded attribution join (batch form of §2.8) ───────
    // The stream-stream attribution join's body run in batch: every
    // click matched to same-user purchases within the 30-minute window.
    // StreamIngestSpec already pins stream == batch on identical events;
    // registering the batch form anchors that parity law to a
    // driver-verified relation (DuckDB interval joins are native).
    "q116_attribution_join" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        graft.streaming.StreamIngest.attributionJoin(
          ev.where(col("event_type") === "click"),
          ev.where(col("event_type") === "purchase"),
          windowMinutes = 30)
      },
      """SELECT c.event_id AS click_id, b.event_id AS purchase_id,
        |  c.user_id AS user_id, c.ts AS click_ts, b.ts AS purchase_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        |  ON c.user_id = b.user_id AND b.ts >= c.ts
        |  AND b.ts <= c.ts + INTERVAL 30 MINUTE""".stripMargin),

    // ── daily resample + forward-fill (time-series gap fill) ───────────
    // Dense per-user daily grid over each user's observed span; days
    // with no events get a row carrying the last observed count, with
    // the gap flagged. The oracle replays grid generation and the
    // IGNORE NULLS carry-forward, so fill semantics are hash-verified.
    "q99_resample_ffill" -> Q(
      (s, dir) => EventWindows.resampleDailyFfill(Tables.events(s, dir)),
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS dt, count(*) AS n
        |               FROM events GROUP BY 1, 2),
        |bounds AS (SELECT user_id, min(dt) AS d0, max(dt) AS d1 FROM daily GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS dt
        |         FROM bounds),
        |j AS (SELECT g.user_id, g.dt, d.n FROM grid g
        |      LEFT JOIN daily d ON d.user_id = g.user_id AND d.dt = g.dt)
        |SELECT user_id, dt,
        |       cast(last_value(n IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY dt
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_filled,
        |       n IS NULL AS is_gap
        |FROM j""".stripMargin),

    // ── inverted-index text-search mart (FULLTEXT analog) ──────────────
    "q47_text_index" -> Q(
      (s, dir) => graft.mart.TextIndex.build(Tables.documents(s, dir)),
      """SELECT token, doc_id, count(*) AS tf
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE length(token) > 0
        |GROUP BY 1, 2""".stripMargin),

    // conjunctive search over the index: docs containing BOTH terms
    "q48_text_search" -> Q(
      (s, dir) => graft.mart.TextIndex.search(
        graft.mart.TextIndex.build(Tables.documents(s, dir)), Seq("spark", "join")),
      """WITH ti AS (
        |  SELECT token, doc_id, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE length(token) > 0
        |  GROUP BY 1, 2)
        |SELECT doc_id, cast(sum(tf) AS BIGINT) AS hits
        |FROM ti WHERE token IN ('spark', 'join')
        |GROUP BY doc_id
        |HAVING count(DISTINCT token) = 2""".stripMargin),

    // ── multimodal: docs → real farbfeld blobs → real header decode ────
    // The oracle recomputes what the encode→decode roundtrip must yield:
    // dims from the deterministic render params, luma = first codepoint
    // mod 2^16 (the first pixel's 16-bit red channel), n_bytes = the
    // farbfeld container size. Codepoint semantics both sides.
    "q44_multimodal_decode" -> Q(
      (s, dir) => Multimodal.mediaFeatures(Tables.documents(s, dir)),
      """SELECT doc_id,
        |  8 + length(text) % 16 AS width,
        |  4 + doc_id % 8 AS height,
        |  cast(4 AS BIGINT) AS channels,
        |  cast(CASE WHEN length(text) = 0 THEN 0
        |       ELSE unicode(substr(text, 1, 1)) % 65536 END AS BIGINT) AS luma,
        |  16 + 8 * (8 + length(text) % 16) * (4 + doc_id % 8) AS n_bytes
        |FROM documents""".stripMargin),

    // ── range (interval-containment) join ──────────────────────────────
    // Every event matched to every 2-hour marker span covering it, per
    // user. The Spark side buckets time into the join key (pairs meet
    // exactly once — no post-join quadratic filter, no dedup); DuckDB's
    // native range join is the oracle, so the bucketed rewrite's
    // inclusive-boundary semantics are verified exactly.
    "q62_range_join" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
        val spans = Tables.events(s, dir)
          .where(col("event_id") % 20 === 0)
          .select(col("event_id").as("span_id"), col("user_id"),
            col("ts").as("span_start"),
            org.apache.spark.sql.functions.expr("ts + INTERVAL 2 HOURS").as("span_end"))
        RangeJoin.pointInInterval(ev, spans, Seq("user_id"), "ts",
            "span_start", "span_end", bucketSeconds = 7200L)
          .select("event_id", "user_id", "span_id", "span_start", "span_end")
      },
      """WITH m AS (SELECT event_id AS span_id, user_id, ts AS span_start,
        |            ts + INTERVAL 2 HOUR AS span_end
        |           FROM events WHERE event_id % 20 = 0)
        |SELECT e.event_id, e.user_id, m.span_id, m.span_start, m.span_end
        |FROM events e JOIN m ON e.user_id = m.user_id
        |  AND e.ts >= m.span_start AND e.ts <= m.span_end""".stripMargin),

    // ── tf·idf-ranked disjunctive text search ──────────────────────────
    // Integer-scaled idf ((N·1000) div df) keeps scoring exact, so the
    // ranking is deterministic and SQL-reproducible.
    "q63_ranked_search" -> Q(
      (s, dir) => graft.mart.TextIndex.rankedSearch(
        graft.mart.TextIndex.build(Tables.documents(s, dir)),
        Seq("spark", "join", "scan"), topK = 20),
      """WITH ti AS (
        |  SELECT token, doc_id, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE length(token) > 0
        |  GROUP BY 1, 2),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM ti
        |       WHERE token IN ('spark', 'join', 'scan') GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM ti),
        |scored AS (
        |  SELECT doc_id, cast(sum(tf * ((n_docs * 1000) // df)) AS BIGINT) AS score
        |  FROM ti JOIN df USING (token) CROSS JOIN n
        |  GROUP BY doc_id),
        |top AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 20)
        |SELECT doc_id, score,
        |       cast(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |FROM top""".stripMargin),

    // ── BM25-ranked search (saturated, length-normalized relevance) ────
    // q63's scoring upgraded to the ranking function IR actually uses,
    // kept exact-integer (k1=6/5, b=3/4 folded into one floor division
    // per term — see TextIndex.bm25Search's spec). The oracle replays
    // the identical integer formula, so saturation and length
    // normalization are hash-verified, not approximated.
    "q96_bm25_search" -> Q(
      (s, dir) => graft.mart.TextIndex.bm25Search(
        graft.mart.TextIndex.build(Tables.documents(s, dir)),
        Seq("spark", "join", "scan"), topK = 20),
      """WITH ti AS (
        |  SELECT token, doc_id, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE length(token) > 0
        |  GROUP BY 1, 2),
        |dl AS (SELECT doc_id, cast(sum(tf) AS BIGINT) AS dl FROM ti GROUP BY 1),
        |st AS (SELECT count(DISTINCT doc_id) AS n_docs,
        |              cast(sum(tf) AS BIGINT) AS tl FROM ti),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM ti
        |       WHERE token IN ('spark', 'join', 'scan') GROUP BY 1),
        |scored AS (
        |  SELECT ti.doc_id,
        |         cast(sum((((n_docs * 1000) // df) * 22 * tf * ((10 * tl) // n_docs))
        |              // (10 * ((10 * tl) // n_docs) * tf
        |                  + 3 * ((10 * tl) // n_docs) + 90 * dl.dl)) AS BIGINT) AS score
        |  FROM ti JOIN df USING (token) JOIN dl ON dl.doc_id = ti.doc_id CROSS JOIN st
        |  GROUP BY 1),
        |top AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 20)
        |SELECT doc_id, score,
        |       cast(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |FROM top""".stripMargin),

    // ── reciprocal-rank fusion (hybrid retrieval) ──────────────────────
    // The standard combiner for heterogeneous rankers: q63's tf-idf
    // list and q96's BM25 list fused by Σ 10⁶ div (60 + rank).
    // Exact-integer throughout, so the full two-ranker + fusion
    // pipeline hash-matches the oracle's replay of both scorings.
    "q98_rrf_fusion" -> Q(
      (s, dir) => {
        val idx = graft.mart.TextIndex.build(Tables.documents(s, dir))
        val terms = Seq("spark", "join", "scan")
        graft.mart.TextIndex.rrfFuse(Seq(
          graft.mart.TextIndex.rankedSearch(idx, terms, topK = 20),
          graft.mart.TextIndex.bm25Search(idx, terms, topK = 20)),
          kRrf = 60, topK = 20)
      },
      """WITH ti AS (
        |  SELECT token, doc_id, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE length(token) > 0
        |  GROUP BY 1, 2),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM ti),
        |tdf AS (SELECT token, count(DISTINCT doc_id) AS df FROM ti
        |        WHERE token IN ('spark', 'join', 'scan') GROUP BY 1),
        |tscored AS (
        |  SELECT doc_id, cast(sum(tf * ((n_docs * 1000) // df)) AS BIGINT) AS score
        |  FROM ti JOIN tdf USING (token) CROSS JOIN n GROUP BY doc_id),
        |ttop AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |         FROM (SELECT * FROM tscored ORDER BY score DESC, doc_id LIMIT 20)),
        |dl AS (SELECT doc_id, cast(sum(tf) AS BIGINT) AS dl FROM ti GROUP BY 1),
        |st AS (SELECT count(DISTINCT doc_id) AS n_docs,
        |              cast(sum(tf) AS BIGINT) AS tl FROM ti),
        |bscored AS (
        |  SELECT ti.doc_id,
        |         cast(sum((((st.n_docs * 1000) // tdf.df) * 22 * tf * ((10 * tl) // st.n_docs))
        |              // (10 * ((10 * tl) // st.n_docs) * tf
        |                  + 3 * ((10 * tl) // st.n_docs) + 90 * dl.dl)) AS BIGINT) AS score
        |  FROM ti JOIN tdf USING (token) JOIN dl ON dl.doc_id = ti.doc_id CROSS JOIN st
        |  GROUP BY 1),
        |btop AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |         FROM (SELECT * FROM bscored ORDER BY score DESC, doc_id LIMIT 20)),
        |u AS (SELECT doc_id, 1000000 // (60 + rank) AS c FROM ttop
        |      UNION ALL SELECT doc_id, 1000000 // (60 + rank) AS c FROM btop),
        |f AS (SELECT doc_id, cast(sum(c) AS BIGINT) AS rrf_score,
        |             count(*) AS n_lists FROM u GROUP BY 1),
        |ftop AS (SELECT * FROM f ORDER BY rrf_score DESC, doc_id LIMIT 20)
        |SELECT doc_id, rrf_score, n_lists,
        |       cast(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
        |FROM ftop""".stripMargin),

    // ── PII redaction (pre-training scrub) ─────────────────────────────
    // The fixture corpus carries no PII, so deterministic synthetic PII
    // is injected first (email + IP + phone per doc) and the scrub must
    // find and redact it; patterns are interpolated from the SAME Scala
    // constants the engine uses, so the two sides cannot drift.
    "q64_pii_scrub" -> Q(
      (s, dir) => {
        val injected = Tables.documents(s, dir).select(col("doc_id"),
          concat(col("text"),
            lit(" reach user"), col("doc_id").cast("string"),
            lit("@example.com via 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".7 or +1555000"), col("doc_id").cast("string")).as("text"))
        TextAnalysis.scrubPii(injected)
      },
      {
        val inj = "text || ' reach user' || cast(doc_id AS VARCHAR)" +
          " || '@example.com via 10.0.' || cast(doc_id % 256 AS VARCHAR)" +
          " || '.7 or +1555000' || cast(doc_id AS VARCHAR)"
        val counts = TextAnalysis.PiiPatterns.map { case (name, re, _) =>
          s"cast(len(regexp_extract_all(t, '$re')) AS BIGINT) AS n_$name" }
          .mkString(",\n  ")
        val cleaned = TextAnalysis.PiiPatterns.foldLeft("t") { case (e, (_, re, tok)) =>
          s"regexp_replace($e, '$re', '$tok', 'g')" }
        s"""WITH inj AS (SELECT doc_id, $inj AS t FROM documents)
           |SELECT doc_id,
           |  $counts,
           |  $cleaned AS clean_text
           |FROM inj""".stripMargin
      }),

    // ── tokenizer-vocabulary induction ─────────────────────────────────
    "q66_vocabulary" -> Q(
      (s, dir) => graft.mart.TextIndex.vocabulary(
        graft.mart.TextIndex.build(Tables.documents(s, dir)),
        minCount = 10L, maxSize = 64),
      """WITH ti AS (
        |  SELECT token, doc_id, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE length(token) > 0
        |  GROUP BY 1, 2),
        |vc AS (SELECT token, cast(sum(tf) AS BIGINT) AS count FROM ti
        |       GROUP BY token HAVING sum(tf) >= 10
        |       ORDER BY count DESC, token LIMIT 64)
        |SELECT token, count,
        |       cast(row_number() OVER (ORDER BY count DESC, token) - 1 AS BIGINT) AS token_id
        |FROM vc""".stripMargin),

    // ── corpus-bigram affinity (n-gram-LM perplexity proxy) ────────────
    "q67_bigram_lm" -> Q(
      (s, dir) => TextAnalysis.bigramAffinity(Tables.documents(s, dir)),
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |             FROM toks WHERE len(t) >= 2)),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |p AS (SELECT doc_id, (c2.c2 * 1000000) // c1.c1 AS p_scaled
        |      FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
        |agg AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_bigrams,
        |               cast(sum(p_scaled) AS BIGINT) AS sum_p
        |        FROM p GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, sum_p,
        |       cast(sum_p AS DOUBLE) / n_bigrams / 1000000.0 AS affinity
        |FROM agg""".stripMargin),

    // ── length-weighted importance sampling ────────────────────────────
    // Keep probability proportional to document length (capped at 100%):
    // the "sample long documents preferentially" rebalancing step, with
    // the deterministic-hash contract shared by q51/q52.
    "q69_weighted_sample" -> Q(
      (s, dir) => Sampling.weightedSample(Tables.documents(s, dir), "doc_id",
          org.apache.spark.sql.functions.least(lit(100),
            org.apache.spark.sql.functions.expr("n_chars div 20")))
        .select("doc_id", "lang", "n_chars"),
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${Sampling.bucketSql("doc_id", "weight")}
         |    < least(100, n_chars // 20)""".stripMargin),

    // ── deterministically salted skew join == plain join ───────────────
    // The salt must be semantically invisible: the salted big-side join
    // (hot keys spread over `factor` sub-keys, small side replicated)
    // aggregates to EXACTLY the plain-join oracle. This is the explicit
    // escape hatch for skew beyond what AQE's split handles.
    "q70_salted_join" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("okey"), col("l_quantity"))
        val ord = Tables.orders(s, dir)
          .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
        graft.util.Scale.saltedJoin(li, ord, "okey", factor = 4)
          .groupBy(col("o_orderpriority"))
          .agg(
            org.apache.spark.sql.functions.count(lit(1)).as("n"),
            org.apache.spark.sql.functions.sum(
              col("l_quantity").cast("long")).as("sum_qty"))
      },
      """SELECT o_orderpriority, count(*) AS n,
        |       cast(sum(cast(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin),

    // ── bucketed co-located fact-fact join == plain join ───────────────
    // Both sides written ONCE as bucketed+sorted tables on the join key,
    // then joined bucket-to-bucket with NO exchange on either side
    // (PlanSpec-asserted) — the single biggest shuffle saver for
    // repeated fact-fact joins at 100 TB: the layout cost is paid once,
    // every subsequent join on the key is exchange-free. Same oracle as
    // q70 (the plain join): bucketing must be semantically invisible.
    "q94_bucketed_join" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("okey"), col("l_quantity"))
        val ord = Tables.orders(s, dir)
          .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
        graft.util.Scale.writeBucketed(li, "graft_q94_li", "okey", buckets = 8)
        graft.util.Scale.writeBucketed(ord, "graft_q94_ord", "okey", buckets = 8)
        s.table("graft_q94_li").join(s.table("graft_q94_ord"), "okey")
          .groupBy(col("o_orderpriority"))
          .agg(
            org.apache.spark.sql.functions.count(lit(1)).as("n"),
            org.apache.spark.sql.functions.sum(
              col("l_quantity").cast("long")).as("sum_qty"))
      },
      """SELECT o_orderpriority, count(*) AS n,
        |       cast(sum(cast(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin),

    // ── trigram-index substring search (LIKE '%needle%' via index) ─────
    // Candidates from a conjunctive trigram probe, needle confirmed on
    // candidates only; oracle is the direct corpus scan — the index path
    // must find exactly the scan's matches.
    "q71_substring_search" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.mart.TextIndex.substringSearch(
          graft.mart.TextIndex.trigramIndex(docs), docs, "spark join")
      },
      """SELECT doc_id,
        |  (length(text) - length(replace(text, 'spark join', ''))) // 10 AS hits
        |FROM documents WHERE contains(text, 'spark join')""".stripMargin),

    // ── per-stratum winsorization (outlier clipping at p99) ────────────
    "q72_winsorize" -> Q(
      (s, dir) => {
        val toks = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          org.apache.spark.sql.functions.size(
            org.apache.spark.sql.functions.split(col("text"), " "))
            .cast("long").as("n_tok"))
        val p99 = toks.groupBy(col("lang"))
          .agg(org.apache.spark.sql.functions.expr("percentile(n_tok, 0.99)").as("p99"))
        toks.join(org.apache.spark.sql.functions.broadcast(p99), "lang")
          .select(col("doc_id"), col("lang"), col("n_tok"),
            org.apache.spark.sql.functions.least(
              col("n_tok").cast("double"), col("p99")).as("n_tok_clip"))
      },
      """WITH t AS (SELECT doc_id, lang,
        |             cast(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |p AS (SELECT lang, quantile_cont(n_tok, 0.99) AS p99 FROM t GROUP BY lang)
        |SELECT doc_id, t.lang, n_tok, least(cast(n_tok AS DOUBLE), p99) AS n_tok_clip
        |FROM t JOIN p USING (lang)""".stripMargin),

    // ── composite corpus-cleaning pipeline ─────────────────────────────
    // The operators composed the way a real pre-training run chains
    // them: language-consistency (q37) ∧ min length (q38) ∧ low
    // repetition (q55) ∧ decontaminated (q54). Each stage is the SAME
    // function the standalone query registers — the oracle recomputes
    // all four predicates and must agree on the surviving set.
    "q74_clean_pipeline" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val langOk = TextAnalysis.langId(docs)
          .where(col("is_match")).select("doc_id")
        val longEnough = TextAnalysis.qualityScore(docs)
          .where(col("n_tokens") >= 25).select("doc_id")
        val lowRep = TextAnalysis.repetitionScore(docs, n = 2)
          .where(col("rep_ratio") < 0.05).select("doc_id")
        Dedup.decontaminate(docs, docs.where(col("doc_id") % 97 === 0), n = 3)
          .join(langOk, Seq("doc_id"), "left_semi")
          .join(longEnough, Seq("doc_id"), "left_semi")
          .join(lowRep, Seq("doc_id"), "left_semi")
          .select("doc_id", "lang")
      },
      cleanPipelineSql),

    // ── fused cleaning pipeline == the composed one (scale path) ───────
    // Same oracle as q74: all per-row predicates computed in ONE corpus
    // scan (cleanSignals) instead of one scan per standalone operator —
    // the driver itself verifies the fusion loses nothing.
    "q91_clean_fused" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pass = TextAnalysis.cleanSignals(docs)
          .where(col("lang_guess") === col("lang") &&
            col("n_tokens") >= 25 && col("rep_ratio") < 0.05)
          .select("doc_id")
        Dedup.decontaminate(docs, docs.where(col("doc_id") % 97 === 0), n = 3)
          .join(pass, Seq("doc_id"), "left_semi")
          .select("doc_id", "lang")
      },
      cleanPipelineSql),

    // ── label-prototype mean pooling (exploded scalar form) ────────────
    "q75_embedding_pool" -> Q(
      (s, dir) => Similarity.meanPool(Tables.embeddings(s, dir), "label"),
      """SELECT label, cast(i - 1 AS BIGINT) AS pos,
        |  count(*) AS n_vecs,
        |  cast(sum(cast(round(embedding[i]::DOUBLE * 1000) AS BIGINT)) AS BIGINT) AS sum_q,
        |  cast(sum(cast(round(embedding[i]::DOUBLE * 1000) AS BIGINT)) AS DOUBLE)
        |    / count(*) AS mean_q
        |FROM (SELECT label, embedding,
        |        unnest(range(1, len(embedding) + 1)) AS i
        |      FROM embeddings)
        |GROUP BY label, i""".stripMargin),

    // ── chunk → document reassembly (roundtrip law) ────────────────────
    // chunk(stride == size) followed by reassemble must reproduce the
    // corpus text EXACTLY — the oracle is simply the documents table.
    "q76_chunk_roundtrip" -> Q(
      (s, dir) => TextAnalysis.reassemble(
        TextAnalysis.chunk(Tables.documents(s, dir), chunkSize = 16, stride = 16)),
      "SELECT doc_id, text FROM documents"),

    // ── overlapping token-window chunking ──────────────────────────────
    "q68_doc_chunks" -> Q(
      (s, dir) => TextAnalysis.chunk(Tables.documents(s, dir),
        chunkSize = 32, stride = 24),
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |st AS (SELECT doc_id, t, unnest(range(1, len(t) + 1, 24)) AS s FROM toks)
        |SELECT doc_id, cast((s - 1) // 24 AS BIGINT) AS chunk_id,
        |       array_to_string(t[s:s+31], ' ') AS chunk_text,
        |       cast(least(32, len(t) - s + 1) AS BIGINT) AS chunk_tok
        |FROM st""".stripMargin),

    // ── training-ready sharded EXPORT (the artifact a trainer reads) ───
    // The terminal composition of the prep side: proportional mix
    // (q123) → deterministic shuffle-shards (q124) → the layout WRITE
    // (hive-partitioned by shard, the window exchange reused as the
    // write partitioning — Sampling.writeTrainingShards) → probe
    // shard 0 back FROM the persisted tree. The oracle rederives the
    // water-filling budgets AND the shard/pos arithmetic in SQL, so
    // the driver verifies the whole export end-to-end including the
    // layout round trip (q128's write-the-artifact-in-query
    // discipline); PlanSpec pins the one-exchange write plan.
    "q129_training_export" -> Q(
      (s, dir) => {
        val withTok = Tables.documents(s, dir).select(col("doc_id"),
          col("lang"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
        val mixed = Sampling.sampleToProportions(withTok, "doc_id", "lang",
          "n_tokens", MixWeights)
        val path = Similarity.scratchIndexDir("q129") + "/shards"
        Sampling.writeTrainingShards(mixed, "doc_id", nShards = 8, path)
          .where(col("shard") === 0)
          .select(col("doc_id"), col("lang"), col("n_tokens"), col("pos"))
      },
      {
        val tokSrc = "SELECT doc_id, lang, cast(len(string_split(text, ' ')) " +
          "AS BIGINT) AS n_tokens FROM documents"
        val domList = MixWeights.map(w => s"'${w._1}'").mkString(", ")
        s"""WITH ${Sampling.proportionBudgetCtes(tokSrc, "lang", "n_tokens", MixWeights)},
           |src AS (SELECT * FROM ($tokSrc) WHERE lang IN ($domList)),
           |mixed AS (SELECT doc_id, lang, n_tokens,
           |    ${Sampling.cumTokensSql("doc_id", "lang", "n_tokens", "mix")} AS cum
           |  FROM src),
           |kept AS (SELECT m.doc_id, m.lang, m.n_tokens FROM mixed m
           |  JOIN budget b ON m.lang = b.domain WHERE m.cum <= b.b)
           |SELECT doc_id, lang, n_tokens,
           |  row_number() OVER (
           |    PARTITION BY ${Sampling.rowHashSql("doc_id", "shard")} % 8
           |    ORDER BY ${Sampling.rowHashSql("doc_id", "shard:order")}, doc_id) - 1
           |    AS pos
           |FROM kept
           |WHERE ${Sampling.rowHashSql("doc_id", "shard")} % 8 = 0""".stripMargin
      }),

    // ── paragraph-grain near-dedup (boilerplate removal) ───────────────
    // Document-grain dedup never sees the license blurb repeated across
    // ten thousand otherwise-distinct pages; this composition dedups at
    // the chunk grain: non-overlapping 16-token chunks (q68/q76's
    // grain) → 64-bit SimHash near-dup pairs over the chunk relation
    // (q92's generator, composite doc·2²⁰+chunk keys) → every chunk
    // near-dup to a lower-keyed one is cut first-wins (q113's
    // discipline) → survivors reassemble in chunk order (q76). The
    // oracle chains the same generated fragments — chunk CTE, the
    // simhash CTE chain re-sourced onto it, brute-force pairs, cut +
    // stitch — so the driver hash-verifies the whole rewrite including
    // the emitted text and per-doc audit count.
    "q130_paragraph_dedup" -> Q(
      (s, dir) => TextAnalysis.dedupParagraphs(Tables.documents(s, dir),
        chunkTok = 16, maxDist = 3),
      paragraphDedupOracleSql),

    // q130 with the CHUNK-DF CAP armed (round-19, VERDICT r18 item 4):
    // band buckets larger than maxBandDf emit a star around the bucket
    // minimum instead of the clique — the guard that keeps the pair
    // volume bucket-LINEAR when one boilerplate chunk is repeated
    // across ~10⁶ documents (the q213 hot-anchor discipline on the
    // banded SimHash join; q31's stop-shingle economics). On the
    // organic corpus no chunk band bucket reaches the cap (measured
    // max band-bucket df: 20 at sf0.001, 15 at sf0.01, 172 at sf0.1 —
    // the r19 probe; cap 256 clears all three, and 128 would ENGAGE
    // at sf0.1, which is why the q213 default is not reused here), so
    // the capped plan must produce EXACTLY the uncapped relation —
    // the oracle is q130's VERBATIM, and the driver gate proves the
    // cap's no-op contract on real data. The planted mega-boilerplate
    // behavior (bounded volume, identical-fingerprint cut-set
    // preservation) is spec-pinned in ExtSpec.
    "q232_paragraph_dedup_capped" -> Q(
      (s, dir) => TextAnalysis.dedupParagraphs(Tables.documents(s, dir),
        chunkTok = 16, maxDist = 3, maxBandDf = 256),
      paragraphDedupOracleSql),

    // ── fastText-class linear quality classifier (hashed features) ─────
    // Production quality scoring is a trained linear model, not a
    // heuristic: tokens hash into 64 feature buckets (hashing trick),
    // the planted weight vector rides as an array literal (q121's
    // map-literal discipline — zero joins, zero exchanges, one scan),
    // and the doc keeps iff the exact-integer raw score is positive.
    // The oracle rebuilds the SAME weight literals from the SAME Scala
    // constant and replays bucket hash + fold, so the driver verifies
    // the model application itself.
    "q131_linear_quality" -> Q(
      (s, dir) => TextAnalysis.linearQualityScore(Tables.documents(s, dir),
        TextAnalysis.DefaultQualityWeights, bias = 0L),
      {
        val w = TextAnalysis.DefaultQualityWeights
        val d = w.length
        s"""WITH tf AS (SELECT doc_id, tok
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |        FROM documents) WHERE len(tok) > 0),
           |sc AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_tokens,
           |    cast(sum(([${w.mkString(", ")}])[
           |      cast(${sqlHash64("tok")} % $d AS INT) + 1]) AS BIGINT)
           |      AS score_raw
           |  FROM tf GROUP BY doc_id)
           |SELECT d.doc_id,
           |  coalesce(sc.n_tokens, cast(0 AS BIGINT)) AS n_tokens,
           |  coalesce(sc.score_raw, cast(0 AS BIGINT)) AS score_raw,
           |  coalesce(sc.score_raw, cast(0 AS BIGINT)) > 0 AS keep
           |FROM documents d LEFT JOIN sc USING (doc_id)""".stripMargin
      }),

    // ── EXACT paragraph dedup (the cheap first tier of q130) ───────────
    // C4/CCNet-class pipelines remove exactly-repeated lines/paragraphs
    // BEFORE any near-dup machinery: chunks group by content hash, the
    // first occurrence in (doc_id, chunk_id) order survives (P7's
    // first-wins total order at chunk grain), survivors reassemble.
    // No pair relation exists at all — one rank window on md5 with
    // WindowGroupLimit pushdown (PlanSpec) — which is why this tier
    // runs first at 100 TB. Oracle replays hash-group ranking + stitch.
    "q132_paragraph_dedup_exact" -> Q(
      (s, dir) => TextAnalysis.dedupParagraphsExact(Tables.documents(s, dir),
        chunkTok = 16),
      """WITH ch AS (SELECT doc_id, cast((s - 1) // 16 AS BIGINT) AS chunk_id,
        |    array_to_string(t[s:s+15], ' ') AS chunk_text
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1, 16)) AS s
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents))),
        |keptch AS (SELECT doc_id, chunk_id, chunk_text FROM (
        |  SELECT doc_id, chunk_id, chunk_text,
        |    row_number() OVER (PARTITION BY md5(chunk_text)
        |      ORDER BY doc_id, chunk_id) AS rk
        |  FROM ch) WHERE rk = 1),
        |stitched AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_kept,
        |    string_agg(chunk_text, ' ' ORDER BY chunk_id) AS text_clean
        |  FROM keptch GROUP BY doc_id),
        |tot AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_ch
        |        FROM ch GROUP BY doc_id)
        |SELECT t.doc_id,
        |  t.n_ch - coalesce(st.n_kept, 0) AS n_removed_chunks,
        |  coalesce(st.text_clean, '') AS text_clean
        |FROM tot t LEFT JOIN stitched st USING (doc_id)""".stripMargin),

    // ── the GRAND export composition (raw corpus → trainer artifact) ───
    // q108's full prep chain (quality gate → exact dedup →
    // decontaminate → split → cap → token-budget mix) feeding q129's
    // terminal path (shuffle-shards → hive-partitioned layout write →
    // probe shard 0 from the persisted tree): raw documents in, the
    // artifact a training run consumes out, ONE query, ONE oracle —
    // the same prep CTE chain q108's gate already verifies, wrapped in
    // the shard/pos arithmetic. The verified-parts/unverified-whole
    // closure for the entire prep-to-trainer path.
    "q133_pipeline_export" -> Q(
      (s, dir) => {
        val path = Similarity.scratchIndexDir("q133") + "/shards"
        Sampling.writeTrainingShards(prepMixed(s, dir), "doc_id",
          nShards = 8, path)
          .where(col("shard") === 0)
          .select(col("doc_id"), col("lang_guess"), col("n_tokens"), col("pos"))
      },
      s"""WITH $prepMixedCtes
         |SELECT doc_id, lang_guess, n_tokens,
         |  row_number() OVER (
         |    PARTITION BY ${Sampling.rowHashSql("doc_id", "shard")} % 8
         |    ORDER BY ${Sampling.rowHashSql("doc_id", "shard:order")}, doc_id) - 1
         |    AS pos
         |FROM prepmixed
         |WHERE ${Sampling.rowHashSql("doc_id", "shard")} % 8 = 0""".stripMargin),

    // ── dataset card (the release report a corpus ships with) ──────────
    // Per (language, split): document count, token count, and the
    // corpus-wide token share in EXACT integer parts-per-million
    // (floor division of exact longs — no float in the artifact, so
    // any engine rederives it bit-identically). Composes q51's bucket
    // split with one rollup + one global-total window.
    "q136_dataset_card" -> Q(
      (s, dir) => {
        val withTok = Sampling.assignSplits(
          Tables.documents(s, dir).select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
          "doc_id")
        withTok.groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
          .withColumn("_total", sum(col("tokens")).over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
          .selectExpr("lang", "split", "n_docs", "tokens",
            "(tokens * 1000000) div _total AS token_share_ppm")
      },
      s"""WITH t AS (SELECT lang,
         |    CASE WHEN ${Sampling.bucketSql("doc_id", "split")} < 80 THEN 'train'
         |         WHEN ${Sampling.bucketSql("doc_id", "split")} < 90 THEN 'val'
         |         ELSE 'test' END AS split,
         |    cast(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |a AS (SELECT lang, split, cast(count(*) AS BIGINT) AS n_docs,
         |    cast(sum(n_tokens) AS BIGINT) AS tokens
         |  FROM t GROUP BY 1, 2)
         |SELECT lang, split, n_docs, tokens,
         |  tokens * 1000000 // (SELECT cast(sum(tokens) AS BIGINT) FROM a)
         |    AS token_share_ppm
         |FROM a""".stripMargin),

    // ── SemDeDup: cluster-scoped embedding dedup (k-means geometry) ────
    // The published semantic-dedup recipe: k-means partitions the
    // space, cosine runs ONLY within clusters (candidate volume
    // Σ n_c², never n²), then the standard CC + highest-energy
    // survivor policy (q118's tail on a different pair source — the
    // third pruning geometry beside LSH and IVF). Recall deliberately
    // differs from LSH (cross-centroid pairs are missed — the
    // documented trade); the oracle replays training + assignment +
    // within-cluster pairs + closure exactly, so the policy's OUTPUT
    // is hash-verified end to end.
    "q137_semantic_dedup" -> Q(
      (s, dir) => semanticClusters(s, dir),
      s"""WITH RECURSIVE $semanticClusterCtes
         |SELECT l.vec_id, s.canonical_id,
         |  count(*) OVER (PARTITION BY l.cl) AS cluster_size
         |FROM slab l JOIN ssurv s USING (cl)""".stripMargin),

    // ── the DEDUP CASCADE funnel (the production multi-tier recipe) ────
    // Exact → fuzzy (MinHash/Jaccard/CC) → semantic (SemDeDup), with
    // EXCLUSIVE first-tier attribution — the report that tells an
    // operator what each tier contributes before committing a 100 TB
    // run to it. Tier relations are the SAME verified chains q30, q120/
    // q135, and q137 register (exact keeper = min doc per content hash;
    // fuzzy canonical = longest-text cluster survivor; semantic
    // canonical = max-energy embedding survivor, vec_id ≡ doc_id); a
    // document counts against the FIRST tier that would remove it.
    // Output is the |reasons|-row funnel — metadata-sized at any corpus
    // scale; the oracle replays all three chains in one WITH RECURSIVE.
    "q147_dedup_cascade" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val keeper = docs
          .groupBy(org.apache.spark.sql.functions.md5(col("text")).as("_h"))
          .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("keeper"))
        val fuzzy = fuzzyClusters(s, dir)
          .select(col("doc_id"), col("canonical_id").as("f_canon"))
        val sem = semanticClusters(s, dir)
          .select(col("vec_id").as("doc_id"), col("canonical_id").as("s_canon"))
        val reason = org.apache.spark.sql.functions
          .when(col("keeper") =!= col("doc_id"), "exact")
          .when(col("f_canon") =!= col("doc_id"), "fuzzy")
          .when(col("s_canon").isNotNull && col("s_canon") =!= col("doc_id"),
            "semantic")
          .otherwise("kept")
        docs.select(col("doc_id"),
            org.apache.spark.sql.functions.md5(col("text")).as("_h"))
          .join(keeper, "_h")
          .join(fuzzy, Seq("doc_id"))
          .join(sem, Seq("doc_id"), "left")
          .select(reason.as("reason"))
          .groupBy(col("reason")).agg(count(lit(1)).as("n_docs"))
      },
      fuzzyClusterCtes + ",\n" + semanticClusterCtes +
        """, ex AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
          |         FROM documents),
          |fz AS (SELECT l.doc_id, s.canonical_id AS f_canon
          |       FROM lab l JOIN surv s USING (cl)),
          |sm AS (SELECT l.vec_id AS doc_id, s.canonical_id AS s_canon
          |       FROM slab l JOIN ssurv s USING (cl)),
          |rr AS (SELECT d.doc_id,
          |  CASE WHEN e.keeper <> d.doc_id THEN 'exact'
          |       WHEN fz.f_canon <> d.doc_id THEN 'fuzzy'
          |       WHEN sm.s_canon IS NOT NULL AND sm.s_canon <> d.doc_id
          |         THEN 'semantic'
          |       ELSE 'kept' END AS reason
          |  FROM documents d JOIN ex e USING (doc_id) JOIN fz USING (doc_id)
          |  LEFT JOIN sm USING (doc_id))
          |SELECT reason, cast(count(*) AS BIGINT) AS n_docs
          |FROM rr GROUP BY reason""".stripMargin),

    // ── bloom-prefiltered exact incremental dedup ──────────────────────
    // q73's exact tier with the anti-join's probe side cut by a bloom
    // filter over the corpus hashes: might_contain=false rows are
    // DEFINITELY new (no false negatives) and skip the join entirely;
    // only the suspected-duplicate sliver takes the exact anti-join
    // that removes false positives. Same relation as a plain hash
    // anti-join — the oracle is that anti-join — so the driver proves
    // the bloom is semantically invisible.
    "q138_bloom_dedup" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.dedupAgainstBloom(
          docs.where(col("doc_id") % 7 === 3),
          docs.where(col("doc_id") % 7 =!= 3))
          .select(col("doc_id"), col("lang"))
      },
      """SELECT doc_id, lang FROM documents
        |WHERE doc_id % 7 = 3
        |  AND md5(text) NOT IN
        |      (SELECT md5(text) FROM documents WHERE doc_id % 7 <> 3)""".stripMargin),

    // ── nearest-class-centroid classification (corpus domain router) ───
    // Supervised prototype classification over the labeled embedding
    // table: class centroids are truncating integer means (the k-means
    // update arithmetic), assignment is the exact-integer squared-
    // Euclidean argmin with smallest-label tie-break — the oracle
    // replays prototypes AND assignment bit-for-bit.
    "q139_centroid_classify" -> Q(
      (s, dir) => KMeans.classifyNearestCentroid(Tables.embeddings(s, dir),
        k = 10),
      {
        val ldp = "list_dot_product"
        def dist(q: String, cv: String) =
          s"cast($ldp($q, $q) + $ldp($cv, $cv) - 2 * $ldp($q, $cv) AS BIGINT)"
        s"""WITH v AS (SELECT vec_id, cast(label AS BIGINT) AS label,
           |    list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
           |  FROM embeddings),
           |s AS (SELECT label, i AS pos, cast(sum(q[i]) AS BIGINT) AS s, count(*) AS n
           |      FROM v, range(1, 65) t(i) GROUP BY label, i),
           |c AS (SELECT label AS c_id, list(s // n ORDER BY pos) AS cvec
           |      FROM s GROUP BY label),
           |a AS (SELECT vec_id, min(${dist("v.q", "c.cvec")} * 10 + c.c_id) % 10 AS pred
           |      FROM v, c GROUP BY vec_id)
           |SELECT v.vec_id, v.label, a.pred, v.label = a.pred AS correct
           |FROM v JOIN a USING (vec_id)""".stripMargin
      }),

    // ── cross-document boilerplate coverage (duplicated n-gram share) ──
    // RefinedWeb/C4-class per-document quality signal: the ppm share of
    // a doc's 8-grams that occur in ≥ 2 documents. Grams shuffle as
    // 64-bit hashes on both sides (same md5 prefix), so hash collisions
    // cannot cause cross-engine drift.
    "q140_boilerplate_score" -> Q(
      (s, dir) => TextAnalysis.boilerplateScore(Tables.documents(s, dir), n = 8),
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |g AS (SELECT doc_id, ${sqlHash64("array_to_string(t[i:i+7], ' ')")} AS gh
         |      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
         |            FROM toks WHERE len(t) >= 8)),
         |f AS (SELECT gh, count(DISTINCT doc_id) AS df FROM g GROUP BY gh),
         |p AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_grams,
         |        cast(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |      FROM g JOIN f USING (gh) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(p.n_grams, cast(0 AS BIGINT)) AS n_grams,
         |  coalesce(p.n_dup, cast(0 AS BIGINT)) AS n_dup,
         |  coalesce(p.n_dup * 1000000 // p.n_grams, cast(0 AS BIGINT)) AS dup_ppm
         |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin),

    // ── hybrid text+vector retrieval (RAG-standard fused search) ───────
    // q96's BM25 list and a cosine top-20 for the query embedding
    // (vec_id 0 ≡ doc_id 0), fused by q98's exact-integer RRF. Each
    // input list is top-k-bounded before fusion, so the fusion stage is
    // query-sized at any corpus scale; the oracle replays BOTH rankers
    // and the fusion.
    "q141_hybrid_search" -> Q(
      (s, dir) => {
        val idx = graft.mart.TextIndex.build(Tables.documents(s, dir))
        val bm25 = graft.mart.TextIndex.bm25Search(idx,
          Seq("spark", "join", "scan"), topK = 20)
        val vec = Similarity.bruteForceTopK(Tables.embeddings(s, dir),
          nQueries = 1, k = 20)
          .select(col("vec_id").as("doc_id"), col("rank"))
        graft.mart.TextIndex.rrfFuse(
          Seq(bm25.select(col("doc_id"), col("rank")), vec),
          kRrf = 60, topK = 20)
      },
      """WITH ti AS (
        |  SELECT token, doc_id, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE length(token) > 0
        |  GROUP BY 1, 2),
        |dl AS (SELECT doc_id, cast(sum(tf) AS BIGINT) AS dl FROM ti GROUP BY 1),
        |st AS (SELECT count(DISTINCT doc_id) AS n_docs,
        |              cast(sum(tf) AS BIGINT) AS tl FROM ti),
        |tdf AS (SELECT token, count(DISTINCT doc_id) AS df FROM ti
        |        WHERE token IN ('spark', 'join', 'scan') GROUP BY 1),
        |bscored AS (
        |  SELECT ti.doc_id,
        |         cast(sum((((st.n_docs * 1000) // tdf.df) * 22 * tf * ((10 * tl) // st.n_docs))
        |              // (10 * ((10 * tl) // st.n_docs) * tf
        |                  + 3 * ((10 * tl) // st.n_docs) + 90 * dl.dl)) AS BIGINT) AS score
        |  FROM ti JOIN tdf USING (token) JOIN dl ON dl.doc_id = ti.doc_id CROSS JOIN st
        |  GROUP BY 1),
        |btop AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |         FROM (SELECT * FROM bscored ORDER BY score DESC, doc_id LIMIT 20)),
        |e AS (SELECT vec_id, q FROM (SELECT vec_id,
        |    list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
        |    FROM embeddings) WHERE list_dot_product(q, q) > 0),
        |vscored AS (
        |  SELECT e.vec_id,
        |    list_dot_product(qs.q, e.q)
        |      / (sqrt(list_dot_product(qs.q, qs.q)) * sqrt(list_dot_product(e.q, e.q))) AS cos
        |  FROM e qs JOIN e ON qs.vec_id < 1 AND e.vec_id != qs.vec_id),
        |vtop AS (SELECT vec_id AS doc_id, rank FROM (
        |    SELECT vec_id, row_number() OVER (ORDER BY cos DESC, vec_id) AS rank
        |    FROM vscored) WHERE rank <= 20),
        |u AS (SELECT doc_id, 1000000 // (60 + rank) AS c FROM btop
        |      UNION ALL SELECT doc_id, 1000000 // (60 + rank) AS c FROM vtop),
        |f AS (SELECT doc_id, cast(sum(c) AS BIGINT) AS rrf_score,
        |             count(*) AS n_lists FROM u GROUP BY 1),
        |ftop AS (SELECT * FROM f ORDER BY rrf_score DESC, doc_id LIMIT 20)
        |SELECT doc_id, rrf_score, n_lists,
        |       cast(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
        |FROM ftop""".stripMargin),

    // ── filter-funnel audit (why documents are dropped) ────────────────
    // Exclusive first-reason attribution across the quality gate in ONE
    // corpus scan (cleanSignals + PII extras), rolled up per (lang,
    // reason). Deterministic synthetic PII is injected into doc_id %
    // 13 = 5 so the 'pii' rung is actually exercised (the q64
    // discipline); the oracle replays injection, every signal, and the
    // priority CASE.
    "q142_filter_funnel" -> Q(
      (s, dir) => Prep.filterFunnel(piiInjectedDocs(s, dir)),
      filterFunnelOracleSql),

    // ── CONTINUOUSLY-MAINTAINED filter funnel (round-13) ───────────────
    // monitorQuality's sidecar read promoted from spec-only additivity
    // to an oracle row: the PII-injected corpus is delivered as three
    // modular batches through the stream's verbatim per-batch body
    // (one batch-sized funnel rollup appended per batch, batch-stamped),
    // and the read folds the sidecar — funnel attribution is per-ROW,
    // so per-batch rollups sum exactly to the one-shot regardless of
    // how documents split into micro-batches. The oracle is q142's
    // VERBATIM, so the driver hash gate proves the additivity law the
    // StreamIngestSpec pins, on the real fixture at 3 SFs. The read is
    // sidecar-sized (batches × |lang × reason| rows) — the corpus is
    // never re-scanned, the dashboard-read shape monitorQuality exists
    // for. Session-cached pricing (q205 discipline).
    "q221_funnel_maintained" -> Q(
      (s, dir) => {
        val store = graft.util.SessionStore.getOrBuild(
          s"funnel|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
          "funnel") { p =>
          val docs = piiInjectedDocs(s, dir)
          (0 to 2).foreach { b =>
            Prep.filterFunnel(docs.where(col("doc_id") % 3 === b))
              .withColumn("batch_id", lit(b.toLong))
              .coalesce(1).write.mode("append").parquet(s"$p/stats")
          }
          // at-least-once: the last batch's summary lands twice (the
          // crash-after-append-before-commit replay) — the read-side
          // distinct must fold it or the gate hash-mismatches
          Prep.filterFunnel(docs.where(col("doc_id") % 3 === 2))
            .withColumn("batch_id", lit(2L))
            .coalesce(1).write.mode("append").parquet(s"$p/stats")
        }
        StreamIngest.readQualityFunnel(s, s"$store/stats")
      },
      filterFunnelOracleSql),

    // ── quality-stratified token-budget mixing ─────────────────────────
    // The quality-weighted sampling recipe: docs tier by their corpus-
    // bigram affinity (q67's LM-proxy score, via exact integer
    // cross-multiplication — no float thresholds), then each tier cuts
    // to its token budget with the q117 deterministic-hash prefix —
    // high-quality text gets the bulk of the training budget. Docs too
    // short to score (< 2 tokens) are unscorable and drop, documented.
    // The oracle rederives the affinity chain, the tier CASE, AND the
    // budget-window cut.
    "q143_quality_mix" -> Q(
      (s, dir) => {
        val aff = TextAnalysis.bigramAffinity(Tables.documents(s, dir))
        val tiered = aff.select(col("doc_id"),
          org.apache.spark.sql.functions.when(
            col("sum_p") >= col("n_bigrams") * 35000L, "high")
            .when(col("sum_p") >= col("n_bigrams") * 34000L, "mid")
            .otherwise("low").as("tier"),
          (col("n_bigrams") + 1).as("n_tokens"))
        Sampling.sampleToTokenBudget(tiered, "doc_id", "tier", "n_tokens",
          QualityBudgets, QualityDefaultBudget)
      },
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
         |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
         |             FROM toks WHERE len(t) >= 2)),
         |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
         |p AS (SELECT doc_id, (c2.c2 * 1000000) // c1.c1 AS p_scaled
         |      FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
         |agg AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_bigrams,
         |               cast(sum(p_scaled) AS BIGINT) AS sum_p
         |        FROM p GROUP BY doc_id),
         |tiered AS (SELECT doc_id,
         |    CASE WHEN sum_p >= n_bigrams * 35000 THEN 'high'
         |         WHEN sum_p >= n_bigrams * 34000 THEN 'mid'
         |         ELSE 'low' END AS tier,
         |    n_bigrams + 1 AS n_tokens FROM agg),
         |cum AS (SELECT doc_id, tier, n_tokens,
         |    ${Sampling.cumTokensSql("doc_id", "tier", "n_tokens", "mix")} AS cum
         |  FROM tiered)
         |SELECT doc_id, tier, cast(n_tokens AS BIGINT) AS n_tokens
         |FROM cum
         |WHERE cum <= ${Sampling.budgetSql("tier", QualityBudgets, QualityDefaultBudget)}""".stripMargin),

    // ── cosine-similarity histogram (dedup threshold calibration) ──────
    // The report an operator reads before choosing tau: pair counts per
    // 0.05-wide cosine bucket above 0.40, from the LSH-pruned pair
    // source (q46 proves it equals brute force at this tau). Bucket
    // arithmetic floors the SAME double both engines compute from
    // exact integer dot products, so bucketing cannot drift.
    "q144_cosine_histogram" -> Q(
      (s, dir) => Similarity.cosineDupPairs(Tables.embeddings(s, dir),
          tau = 0.40, dim = 64)
        .groupBy(org.apache.spark.sql.functions.floor(col("cos") * 20)
          .as("bucket"))
        .agg(count(lit(1)).as("n_pairs")),
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
        |  FROM embeddings),
        |p AS (SELECT list_dot_product(a.q, b.q)
        |    / (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))) AS cos
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.q, b.q)
        |      / (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))) >= 0.40)
        |SELECT cast(floor(cos * 20) AS BIGINT) AS bucket,
        |       cast(count(*) AS BIGINT) AS n_pairs
        |FROM p GROUP BY 1""".stripMargin),

    // ── schema-evolution read (generational corpus layout) ─────────────
    // A corpus accumulated over crawler generations: gen 0 lacks the
    // `source` column that gen 1 added. The engine writes both
    // generations IN-QUERY (hive-partitioned by gen), reads them back
    // through mergeSchema + partition discovery, and null-coalesces the
    // missing column — the lakehouse schema-drift contract. The oracle
    // rederives the union from the base table.
    "q145_schema_evolution" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val base = Similarity.scratchIndexDir("q145") + "/corpus"
        docs.where(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("lang"))
          .write.mode("overwrite").parquet(base + "/gen=0")
        docs.where(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("lang"), col("source"))
          .write.mode("overwrite").parquet(base + "/gen=1")
        s.read.option("mergeSchema", "true").parquet(base)
          .select(col("doc_id"), col("lang"),
            coalesce(col("source"), lit("unknown")).as("source"),
            col("gen").cast("long").as("gen"))
      },
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id % 2 = 1 THEN source ELSE 'unknown' END AS source,
        |  cast(doc_id % 2 AS BIGINT) AS gen
        |FROM documents""".stripMargin),

    // ── corpus-wide top n-grams (WIMBD-class corpus analytics) ─────────
    // The most frequent word 3-grams with counts — the "what is in this
    // corpus" report. TakeOrderedAndProject keeps the top-k partial per
    // partition, so the full gram relation never sorts; the cutoff
    // tie-break orders gram BYTES on both engines (the round-8 collation
    // discipline).
    "q146_top_ngrams" -> Q(
      (s, dir) => TextAnalysis.topNgrams(Tables.documents(s, dir), n = 3, k = 50),
      """WITH g AS (SELECT array_to_string(t[i:i+2], ' ') AS gram
        |  FROM (SELECT t, unnest(range(1, len(t) - 1)) AS i
        |        FROM (SELECT string_split(text, ' ') AS t FROM documents)
        |        WHERE len(t) >= 3)),
        |c AS (SELECT gram, cast(count(*) AS BIGINT) AS n_occ FROM g GROUP BY gram)
        |SELECT gram, n_occ FROM c
        |ORDER BY n_occ DESC, gram LIMIT 50""".stripMargin),

    // ── corpus snapshot diff (dataset release comparison) ──────────────
    // The release tool that answers "what changed between corpus v1 and
    // v2": a synthetic v2 derives deterministically (doc_id%47=30
    // removed, %43=21 modified, %59=3 re-added under a new id), and the
    // diff is ONE full-outer join on doc_id comparing CONTENT HASHES —
    // hash-only columns move, never text, which is what makes snapshot
    // comparison affordable at 100 TB. Oracle replays the derivation
    // rules directly.
    "q152_corpus_diff" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val md5c = org.apache.spark.sql.functions.md5(col("text"))
        val v1 = docs.select(col("doc_id"), md5c.as("h1"))
        val v2 = docs.where(col("doc_id") % 47 =!= 30)
          .select(col("doc_id"),
            org.apache.spark.sql.functions.when(col("doc_id") % 43 === 21,
              concat(col("text"), lit(" v2"))).otherwise(col("text")).as("text"))
          .unionByName(docs.where(col("doc_id") % 59 === 3)
            .select((col("doc_id") + 10000).as("doc_id"), col("text")))
          .select(col("doc_id"), md5c.as("h2"))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            org.apache.spark.sql.functions.when(col("h1").isNull, "added")
              .when(col("h2").isNull, "removed")
              .when(col("h1") =!= col("h2"), "modified")
              .otherwise("unchanged").as("status"))
      },
      """SELECT doc_id,
        |  CASE WHEN doc_id % 47 = 30 THEN 'removed'
        |       WHEN doc_id % 43 = 21 THEN 'modified'
        |       ELSE 'unchanged' END AS status
        |FROM documents
        |UNION ALL
        |SELECT doc_id + 10000 AS doc_id, 'added' AS status
        |FROM documents WHERE doc_id % 59 = 3""".stripMargin),

    // ── canonical text normalization (the pre-hash dedup step) ─────────
    // Mixed-case/punctuated variants are injected (q64's discipline —
    // the fixture is already clean) and the normalizer must fold them
    // back: lowercase, strip non-alphanumerics, squeeze whitespace.
    "q153_normalize" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val messy = org.apache.spark.sql.functions.when(col("doc_id") % 17 === 4,
          concat(org.apache.spark.sql.functions.upper(
              org.apache.spark.sql.functions.substring(col("text"), 1, 10)),
            org.apache.spark.sql.functions.expr("substring(text, 11)"),
            lit(" ,,!!"))).otherwise(col("text"))
        docs.select(col("doc_id"),
          TextAnalysis.normalizeTextCol(messy).as("norm_text"))
      },
      s"""SELECT doc_id,
         |  ${TextAnalysis.normalizeTextSql(
              """CASE WHEN doc_id % 17 = 4
                | THEN upper(substr(text, 1, 10)) || substr(text, 11) || ' ,,!!'
                | ELSE text END""".stripMargin)} AS norm_text
         |FROM documents""".stripMargin),

    // ── normalization-aware exact dedup ────────────────────────────────
    // WHY normalization precedes hashing: uppercase+punctuated variants
    // of existing docs (injected under +20000 ids) hash differently RAW
    // but identically NORMALIZED — the dedup collapses each variant
    // onto its original (q30's first-wins groupBy on the normalized
    // hash). The oracle replays injection, normalization, and grouping.
    "q154_dedup_normalized" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val variants = docs.where(col("doc_id") % 11 === 5)
          .select((col("doc_id") + 20000).as("doc_id"),
            concat(org.apache.spark.sql.functions.upper(col("text")),
              lit(" ,,!!")).as("text"))
        docs.select(col("doc_id"), col("text")).unionByName(variants)
          .groupBy(org.apache.spark.sql.functions.md5(
            TextAnalysis.normalizeTextCol(col("text"))).as("_h"))
          .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_copies"))
          .select(col("doc_id"), col("n_copies"))
      },
      s"""WITH u AS (SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 20000, upper(text) || ' ,,!!' FROM documents
         |  WHERE doc_id % 11 = 5),
         |n AS (SELECT doc_id, ${TextAnalysis.normalizeTextSql("text")} AS nt
         |      FROM u)
         |SELECT min(doc_id) AS doc_id, count(*) AS n_copies
         |FROM n GROUP BY md5(nt)""".stripMargin),

    // ── UNICODE normalization-aware dedup (multilingual keys) ──────────
    // q154's collapse proof for the script q154 cannot touch: the same
    // accented phrase is injected COMPOSED (é = U+00E9, uppercased) and
    // DECOMPOSED (e + U+0301) under disjoint id ranges — raw hashing
    // sees two distinct strings, NFC + casefold
    // (TextAnalysis.normalizeTextUnicodeCol, codegen'd NfcNormalize
    // expression) folds both onto one key, so each injected pair
    // collapses to a single n_copies=2 group. Oracle replays injection
    // through DuckDB's nfc_normalize + lower. The Turkish/Greek locale
    // cases the round-10 operator descoped are CLOSED by the
    // simple_lower casefold and proven by q209's injections.
    "q193_unicode_normalize" -> Q(
      (s, dir) => {
        graft.functions.NfcNormalize.register(s)
        val docs = Tables.documents(s, dir)
        val injected = docs.where(col("doc_id") % 11 === 5)
        val composed = injected.select((col("doc_id") + 30000).as("doc_id"),
          concat(col("text"), lit(" CAFÉ RÉSUMÉ")).as("text"))
        val decomposed = injected.select((col("doc_id") + 40000).as("doc_id"),
          concat(col("text"), lit(" café résumé")).as("text"))
        docs.select(col("doc_id"), col("text"))
          .unionByName(composed).unionByName(decomposed)
          .groupBy(org.apache.spark.sql.functions.md5(
            TextAnalysis.normalizeTextUnicodeCol(col("text"))).as("_h"))
          .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_copies"))
          .select(col("doc_id"), col("n_copies"))
      },
      s"""WITH u AS (SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 30000, text || ' CAFÉ RÉSUMÉ'
         |  FROM documents WHERE doc_id % 11 = 5
         |  UNION ALL
         |  SELECT doc_id + 40000, text || ' café résumé'
         |  FROM documents WHERE doc_id % 11 = 5),
         |n AS (SELECT doc_id, ${TextAnalysis.normalizeTextUnicodeSql("text")} AS nt
         |      FROM u)
         |SELECT min(doc_id) AS doc_id, count(*) AS n_copies
         |FROM n GROUP BY md5(nt)""".stripMargin),

    // ── locale casefold parity: the round-10 descope, closed ───────────
    // q193 deliberately avoided Turkish İ and Greek capital-sigma
    // because Spark's lower() (Java full SpecialCasing: İ → i+U+0307,
    // position-aware final sigma) and DuckDB's lower() (utf8proc
    // SIMPLE map: İ → i, Σ → σ everywhere) disagree — a multilingual
    // key would hash apart across the engines. normalizeTextUnicodeCol
    // now casefolds with the codegen'd SimpleLower kernel (per-
    // codepoint Character.toLowerCase = the same UnicodeData simple
    // map utf8proc implements), so THIS query injects exactly the
    // formerly-descoped cases and lets the driver's hash gate prove
    // engine == oracle on them:
    //  - 'İSTANBUL ŞEHİR' and 'istanbul şehir' MUST collapse
    //    (n_copies 2 — under Java lower() the İ expansion would keep
    //    them apart in the engine while the oracle merged them);
    //  - 'ΑΘΗΝΑΣ ΟΔΟΣ' collapses with its σ-form lowercase 'αθηνασ
    //    οδοσ' (the simple map of Σ), while the natural ς-form
    //    'αθηνας οδος' stays its OWN key — in BOTH engines, which is
    //    the contract: the simple map never folds final sigma, and it
    //    never disagrees about it either.
    "q209_unicode_casefold" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val base = docs.where(col("doc_id") % 13 === 6)
        def inj(off: Int, suffix: String) = base.select(
          (col("doc_id") + off).as("doc_id"),
          concat(col("text"), lit(suffix)).as("text"))
        docs.select(col("doc_id"), col("text"))
          .unionByName(inj(30000, " İSTANBUL ŞEHİR"))
          .unionByName(inj(40000, " istanbul şehir"))
          .unionByName(inj(50000, " ΑΘΗΝΑΣ ΟΔΟΣ"))
          .unionByName(inj(60000, " αθηνασ οδοσ"))
          .unionByName(inj(70000, " αθηνας οδος"))
          .groupBy(org.apache.spark.sql.functions.md5(
            TextAnalysis.normalizeTextUnicodeCol(col("text"))).as("_h"))
          .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_copies"))
          .select(col("doc_id"), col("n_copies"))
      },
      s"""WITH u AS (SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 30000, text || ' İSTANBUL ŞEHİR'
         |  FROM documents WHERE doc_id % 13 = 6
         |  UNION ALL
         |  SELECT doc_id + 40000, text || ' istanbul şehir'
         |  FROM documents WHERE doc_id % 13 = 6
         |  UNION ALL
         |  SELECT doc_id + 50000, text || ' ΑΘΗΝΑΣ ΟΔΟΣ'
         |  FROM documents WHERE doc_id % 13 = 6
         |  UNION ALL
         |  SELECT doc_id + 60000, text || ' αθηνασ οδοσ'
         |  FROM documents WHERE doc_id % 13 = 6
         |  UNION ALL
         |  SELECT doc_id + 70000, text || ' αθηνας οδος'
         |  FROM documents WHERE doc_id % 13 = 6),
         |n AS (SELECT doc_id, ${TextAnalysis.normalizeTextUnicodeSql("text")} AS nt
         |      FROM u)
         |SELECT min(doc_id) AS doc_id, count(*) AS n_copies
         |FROM n GROUP BY md5(nt)""".stripMargin),

    // ── per-document OOV rate against the induced vocabulary ───────────
    // The tokenizer-coverage report: q66's top-64 vocabulary is induced
    // in-query, then every document scores its out-of-vocabulary token
    // share in exact ppm. The vocabulary is maxSize-bounded BY
    // CONSTRUCTION, so scoring is a broadcast map-join against a
    // metadata-sized relation at any corpus scale — the plan has no
    // corpus-sized shuffle at all beyond the per-doc rollup.
    "q148_oov_rate" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val vocab = graft.mart.TextIndex.vocabulary(
          graft.mart.TextIndex.build(docs), minCount = 10L, maxSize = 64)
        val inv = org.apache.spark.sql.functions.broadcast(
          vocab.select(col("token"), lit(1L).as("iv")))
        val scored = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
          .where(length(col("token")) > 0)
          .join(inv, Seq("token"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(org.apache.spark.sql.functions.when(col("iv").isNull, lit(1L))
              .otherwise(lit(0L))).as("n_oov"))
        docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("n_oov"), lit(0L)).as("n_oov"),
            coalesce(org.apache.spark.sql.functions.expr(
              "n_oov * 1000000 div n_tokens"), lit(0L)).as("oov_ppm"))
      },
      """WITH ti AS (
        |  SELECT token, doc_id, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE length(token) > 0
        |  GROUP BY 1, 2),
        |vc AS (SELECT token FROM ti
        |       GROUP BY token HAVING sum(tf) >= 10
        |       ORDER BY cast(sum(tf) AS BIGINT) DESC, token LIMIT 64),
        |tf AS (SELECT doc_id, tok
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE len(tok) > 0),
        |scd AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_tokens,
        |    cast(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |  FROM tf LEFT JOIN vc v ON tf.tok = v.token GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(s.n_tokens, cast(0 AS BIGINT)) AS n_tokens,
        |  coalesce(s.n_oov, cast(0 AS BIGINT)) AS n_oov,
        |  coalesce(s.n_oov * 1000000 // s.n_tokens, cast(0 AS BIGINT)) AS oov_ppm
        |FROM documents d LEFT JOIN scd s USING (doc_id)""".stripMargin),

    // ── temperature-sampled multilingual mixing (α = 1/2) ──────────────
    // The mC4/XLM recipe q123's proportional water-filling can't
    // express: budgets ∝ sqrt(avail) flatten the head so low-resource
    // languages are over-represented relative to raw counts. Weights
    // are EXACT integer square roots (no cross-engine pow/FP-sum
    // hazard); the oracle rederives avail → isqrt weights → budgets →
    // prefix cut entirely in SQL, so the driver verifies the recipe
    // arithmetic itself, not the engine's transcription of it.
    "q157_temperature_mix" -> Q(
      (s, dir) => {
        val withTok = Tables.documents(s, dir).select(col("doc_id"),
          col("lang"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
        Sampling.sampleToTemperature(withTok, "doc_id", "lang", "n_tokens",
          totalBudget = 12000L)
      },
      {
        val tokSrc = "SELECT doc_id, lang, cast(len(string_split(text, ' ')) " +
          "AS BIGINT) AS n_tokens FROM documents"
        s"""WITH ${Sampling.temperatureBudgetCtes(tokSrc, "lang", "n_tokens", 12000L)},
           |tmixed AS (SELECT doc_id, lang, n_tokens,
           |    ${Sampling.cumTokensSql("doc_id", "lang", "n_tokens", "temp")} AS cum
           |  FROM ($tokSrc))
           |SELECT m.doc_id, m.lang, m.n_tokens FROM tmixed m
           |JOIN tbudget b ON m.lang = b.domain
           |WHERE m.cum <= b.b""".stripMargin
      }),

    // ── URL canonicalization + crawl dedup ─────────────────────────────
    // The same page arrives under tracking-query / fragment / WWW /
    // trailing-slash variants; raw-URL dedup misses every one. URLs are
    // synthesized deterministically from (source, doc_id) — id-residue
    // variants inject each noise class (q64's discipline; the fixture
    // has no url column) — then canonicalized and first-wins deduped:
    // docs sharing (source, doc_id % 100) collide BY CONSTRUCTION, so
    // the oracle proves the folds actually merge them. One groupBy
    // exchange on the canonical key; the synthesis and folds are pure
    // projections.
    "q158_url_dedup" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val url = concat(lit("https://"),
          when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
          col("source"), lit(".Example.com/p/"),
          (col("doc_id") % 100).cast("string"),
          when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit("?utm_source=feed&sid="), col("doc_id").cast("string")))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit("#sec-"), col("doc_id").cast("string")))
            .otherwise(lit("")))
        docs.select(col("doc_id"),
            TextAnalysis.canonicalUrlCol(url).as("canonical_url"))
          .groupBy(col("canonical_url"))
          .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_copies"))
          .select(col("canonical_url"), col("doc_id"), col("n_copies"))
      },
      {
        val urlSql = "'https://' || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' " +
          "ELSE '' END) || source || '.Example.com/p/' || " +
          "cast(doc_id % 100 AS VARCHAR) || " +
          "(CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) || " +
          "(CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&sid=' || " +
          "cast(doc_id AS VARCHAR) ELSE '' END) || " +
          "(CASE WHEN doc_id % 7 = 0 THEN '#sec-' || " +
          "cast(doc_id AS VARCHAR) ELSE '' END)"
        // raw url hoisted into its own CTE: the unified fold chain is
        // ~112 expression levels deep and DuckDB's binder recurses at
        // most 128 — the canonical stage must start from a bare column
        // ref, never a nested synthesis expression
        s"""WITH raw AS (SELECT doc_id, $urlSql AS url_raw FROM documents),
           |cu AS (SELECT doc_id,
           |    ${TextAnalysis.canonicalUrlSql("url_raw")} AS canonical_url
           |  FROM raw)
           |SELECT canonical_url, min(doc_id) AS doc_id,
           |  count(*) AS n_copies
           |FROM cu GROUP BY canonical_url""".stripMargin
      }),

    // ── RFC 3986 URL folds (q158's dedup over the three new folds) ─────
    // Same synthesized-collision discipline, now injecting the RFC
    // variants the round-9 verdict named: unreserved %-escapes in the
    // path (%70→p, %2e→. — and one RESERVED %2f that must SURVIVE
    // encoded), the https default port :443, `/./` runs and one
    // `/seg/../` level. Docs sharing (source, doc_id % 100) collapse BY
    // CONSTRUCTION only if every fold lands, so the oracle (the same
    // generated fold chain, replace()-per-escape) proves each one.
    "q194_url_rfc_dedup" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val url = concat(lit("https://"),
          // userinfo variant (round-11): must fold away or these docs
          // never collapse with their (source, doc_id % 100) partners
          when(col("doc_id") % 3 === 1, lit("crawler:tok3n@"))
            .otherwise(lit("")),
          col("source"), lit(".example.com"),
          when(col("doc_id") % 3 === 0, lit(":443")).otherwise(lit("")),
          when(col("doc_id") % 4 === 1, lit("/%70/"))            // %70 → p
            .when(col("doc_id") % 4 === 2, lit("/./p/"))          // /./ run
            .when(col("doc_id") % 4 === 3, lit("/p%2e/../p/"))   // %2e → . then /seg/../
            .otherwise(lit("/p/")),
          (col("doc_id") % 100).cast("string"),
          when(col("doc_id") % 5 === 0, lit("%2fx")).otherwise(lit("")))
        docs.select(col("doc_id"),
            TextAnalysis.canonicalUrlCol(url).as("canonical_url"))
          .groupBy(col("canonical_url"))
          .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_copies"))
          .select(col("canonical_url"), col("doc_id"), col("n_copies"))
      },
      {
        val urlSql = "'https://' || " +
          "(CASE WHEN doc_id % 3 = 1 THEN 'crawler:tok3n@' ELSE '' END) || " +
          "source || '.example.com' || " +
          "(CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END) || " +
          "(CASE WHEN doc_id % 4 = 1 THEN '/%70/' " +
          " WHEN doc_id % 4 = 2 THEN '/./p/' " +
          " WHEN doc_id % 4 = 3 THEN '/p%2e/../p/' " +
          " ELSE '/p/' END) || cast(doc_id % 100 AS VARCHAR) || " +
          "(CASE WHEN doc_id % 5 = 0 THEN '%2fx' ELSE '' END)"
        // raw-url CTE: the q158 binder-depth discipline
        s"""WITH raw AS (SELECT doc_id, $urlSql AS url_raw FROM documents),
           |cu AS (SELECT doc_id,
           |    ${TextAnalysis.canonicalUrlSql("url_raw")} AS canonical_url
           |  FROM raw)
           |SELECT canonical_url, min(doc_id) AS doc_id,
           |  count(*) AS n_copies
           |FROM cu GROUP BY canonical_url""".stripMargin
      }),

    // ── IDN host fold (punycode) → crawl dedup ─────────────────────────
    // The last URL residue closed: real crawls deliver the SAME page as
    // https://bücher.example/... and https://xn--bcher-kva.example/...
    // and raw (or even RFC-folded) dedup keys miss the collision. Docs
    // synthesize hosts from the IdnFixtures table — HALF in unicode
    // form, half already in punycode — sharing (host, doc_id % 100)
    // collide BY CONSTRUCTION iff the IDN fold lands. DuckDB has no
    // punycode, so the oracle is TABLE-DRIVEN: it replays the EXPECTED
    // punycode literal for every doc (both halves), which makes the
    // driver's hash gate a proof that java.net.IDN.toASCII reproduces
    // the recorded form for each injected host AND that the ASCII fast
    // path passes punycode through untouched.
    "q210_idn_url_dedup" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val fx = TextAnalysis.IdnFixtures
        def caseOf(pick: ((String, String)) => String) =
          fx.zipWithIndex.tail.foldLeft(
            when(col("doc_id") % 7 === 0, lit(pick(fx.head)))) {
            case (acc, (pair, i)) =>
              acc.when(col("doc_id") % 7 === i, lit(pick(pair)))
          }
        val host = when(org.apache.spark.sql.functions.expr(
            "(doc_id div 7) % 2 = 0"), caseOf(_._1))
          .otherwise(caseOf(_._2))
        val url = concat(lit("https://"), host, lit(".example.com/p/"),
          (col("doc_id") % 100).cast("string"))
        docs.select(col("doc_id"),
            TextAnalysis.canonicalUrlCol(
              TextAnalysis.idnHostToAsciiCol(url)).as("canonical_url"))
          .groupBy(col("canonical_url"))
          .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_copies"))
          .select(col("canonical_url"), col("doc_id"), col("n_copies"))
      },
      {
        val punyCase = TextAnalysis.IdnFixtures.zipWithIndex.map {
          case ((_, puny), i) => s"WHEN doc_id % 7 = $i THEN '$puny'"
        }.mkString("(CASE ", " ", " END)")
        val urlSql = s"'https://' || $punyCase || '.example.com/p/' || " +
          "cast(doc_id % 100 AS VARCHAR)"
        // raw-url CTE: the q158 binder-depth discipline
        s"""WITH raw AS (SELECT doc_id, $urlSql AS url_raw FROM documents),
           |cu AS (SELECT doc_id,
           |    ${TextAnalysis.canonicalUrlSql("url_raw")} AS canonical_url
           |  FROM raw)
           |SELECT canonical_url, min(doc_id) AS doc_id,
           |  count(*) AS n_copies
           |FROM cu GROUP BY canonical_url""".stripMargin
      }),

    // ── RFC 3986 §5 reference resolution → link-graph rollup ───────────
    // The transform BETWEEN html extraction and URL dedup: every href a
    // page links resolves against the page's own URL, then
    // canonicalizes, then the link graph rolls up in-link counts per
    // target. Eight injected ref classes cover the full case chain —
    // absolute, scheme-relative, absolute-path, query-only,
    // fragment-only, one- and two-level ../ climbs (which must land on
    // the SAME target as the absolute-path class — the collision that
    // proves dot-segment folding), and a plain relative. Pure
    // projection + one groupBy; oracle replays case chain + fold chain
    // from the shared constants.
    "q199_link_resolve" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val n25 = (col("doc_id") % 25).cast("string")
        val base = concat(lit("https://"), col("source"),
          lit(".example.com/a/b/page"), (col("doc_id") % 100).cast("string"))
        val href = when(col("doc_id") % 8 === 0,
            concat(lit("https://mirror.example.org/abs/t"), n25))
          .when(col("doc_id") % 8 === 1,
            concat(lit("//cdn.example.net/lib/t"), n25))
          .when(col("doc_id") % 8 === 2, concat(lit("/a/up/t"), n25))
          .when(col("doc_id") % 8 === 3,
            concat(lit("?page="), (col("doc_id") % 10).cast("string")))
          .when(col("doc_id") % 8 === 4,
            concat(lit("#sec-"), (col("doc_id") % 10).cast("string")))
          .when(col("doc_id") % 8 === 5, concat(lit("../up/t"), n25))
          .when(col("doc_id") % 8 === 6,
            concat(lit("img/t"), n25, lit(".png")))
          .otherwise(concat(lit("../../a/up/t"), n25))
        docs.select(col("doc_id"),
            TextAnalysis.canonicalUrlCol(
              TextAnalysis.resolveUrlCol(base, href)).as("target"))
          .groupBy(col("target"))
          .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_links"))
          .select(col("target"), col("doc_id"), col("n_links"))
      },
      {
        val n25 = "cast(doc_id % 25 AS VARCHAR)"
        val baseSql = "'https://' || source || '.example.com/a/b/page' || " +
          "cast(doc_id % 100 AS VARCHAR)"
        val refSql = "(CASE " +
          s"WHEN doc_id % 8 = 0 THEN 'https://mirror.example.org/abs/t' || $n25 " +
          s"WHEN doc_id % 8 = 1 THEN '//cdn.example.net/lib/t' || $n25 " +
          s"WHEN doc_id % 8 = 2 THEN '/a/up/t' || $n25 " +
          "WHEN doc_id % 8 = 3 THEN '?page=' || cast(doc_id % 10 AS VARCHAR) " +
          "WHEN doc_id % 8 = 4 THEN '#sec-' || cast(doc_id % 10 AS VARCHAR) " +
          s"WHEN doc_id % 8 = 5 THEN '../up/t' || $n25 " +
          s"WHEN doc_id % 8 = 6 THEN 'img/t' || $n25 || '.png' " +
          s"ELSE '../../a/up/t' || $n25 END)"
        s"""WITH lk AS (SELECT doc_id,
           |    ${TextAnalysis.resolveUrlSql(baseSql, refSql)} AS resolved
           |  FROM documents),
           |cu AS (SELECT doc_id,
           |    ${TextAnalysis.canonicalUrlSql("resolved")} AS target
           |  FROM lk),
           |final AS (SELECT target, min(doc_id) AS doc_id,
           |    count(*) AS n_links FROM cu GROUP BY target)
           |SELECT target, doc_id, n_links FROM final""".stripMargin
      }),

    // ── HTML main-text extraction ──────────────────────────────────────
    // The first transform of every web-crawl pipeline: documents are
    // wrapped in deterministic HTML chrome (title, a <script> whose
    // contents contain < and > that naive tag-stripping would leak, an
    // id-residue <style> block, escaped entities) and the extractor
    // must recover the clean text — script/style subtrees dropped WITH
    // contents, tags stripped, the five XML entities decoded, &amp;
    // last. The oracle replays wrap + extract with the same regexes,
    // so the driver verifies the full round trip. Pure projection,
    // zero exchanges.
    "q159_html_extract" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val html = concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title><script type=\"text/javascript\">var x = 1 < 2 && y > 0;</script></head><body class=\"Main\">"),
          when(col("doc_id") % 4 === 1,
            lit("<style>p { color: #fff; }</style>")).otherwise(lit("")),
          lit("<h1>Title &amp; Tags &lt;escaped&gt;</h1><p>"), col("text"),
          lit("</p><div id=\"footer\">footer&#39;s note</div></body></html>"))
        docs.select(col("doc_id"),
          TextAnalysis.htmlExtractCol(html).as("clean_text"))
      },
      {
        val htmlSql = "'<html><head><title>Doc ' || cast(doc_id AS VARCHAR) " +
          "|| '</title><script type=\"text/javascript\">var x = 1 < 2 && y > 0;" +
          "</script></head><body class=\"Main\">' || " +
          "(CASE WHEN doc_id % 4 = 1 THEN '<style>p { color: #fff; }</style>' " +
          "ELSE '' END) || '<h1>Title &amp; Tags &lt;escaped&gt;</h1><p>' || " +
          "text || '</p><div id=\"footer\">footer&#39;s note</div></body></html>'"
        s"""SELECT doc_id, ${TextAnalysis.htmlExtractSql(htmlSql)} AS clean_text
           |FROM documents""".stripMargin
      }),

    // ── near-dup cluster-size histogram (tau-tuning report) ────────────
    // The report an operator reads before committing a dedup threshold:
    // how much mass sits in clusters of each size. q45's full chain
    // (capped candidates → exact Jaccard → connected components) rolls
    // up canonical → size → count; output is ≤ max-cluster-size rows
    // at any corpus scale. The fixture carries natural near-dup mass
    // (22 pairs + a triple at sf0.01), so the histogram is non-trivial
    // without injection.
    "q160_cluster_histogram" -> Q(
      // reads the session clustering store (round-16) — the histogram
      // is a metadata-sized rollup of the q45 labeling, not a reason to
      // re-run the pairs→CC chain
      (s, dir) => jaccard5Clusters(s, dir)
        .groupBy(col("cluster_size"))
        .agg(countDistinct(col("canonical_id")).as("n_clusters"))
        .select(col("cluster_size"), col("n_clusters")),
      shingleBase5.replaceFirst("WITH ", "WITH RECURSIVE ") + cappedJaccardPairsSql +
        """, qual AS (
          |  SELECT doc_a, doc_b FROM pairs
          |  JOIN cnt ca ON doc_a = ca.doc_id
          |  JOIN cnt cb ON doc_b = cb.doc_id
          |  WHERE cast(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5),
          |sym AS (SELECT doc_a AS a, doc_b AS b FROM qual
          |        UNION ALL SELECT doc_b, doc_a FROM qual),
          |reach(a, b) AS (
          |  SELECT a, b FROM sym
          |  UNION
          |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
          |canon AS (SELECT a AS id, least(a, min(b)) AS canonical
          |          FROM reach GROUP BY a),
          |lab AS (SELECT d.doc_id, coalesce(c.canonical, d.doc_id) AS canonical_id
          |        FROM documents d LEFT JOIN canon c ON d.doc_id = c.id),
          |cl AS (SELECT canonical_id, count(*) AS cluster_size
          |       FROM lab GROUP BY canonical_id)
          |SELECT cluster_size, count(*) AS n_clusters
          |FROM cl GROUP BY cluster_size""".stripMargin),

    // ── MinHash estimator calibration curve ────────────────────────────
    // Before trusting banded LSH at a new tau: per estimator level
    // (matching signature components 0..k), how many candidate pairs
    // land there and what their TRUE mean Jaccard is — the empirical
    // false-positive mass the verify stage will discard. Exact integer
    // ppm arithmetic end to end; zero-intersection band collisions are
    // kept at inter = 0 (they are the thing being measured). Output is
    // ≤ k+1 rows at any corpus scale.
    "q161_minhash_calibration" -> Q(
      (s, dir) => Dedup.minhashCalibration(Tables.documents(s, dir), n = 3),
      shingleBase3 + minhashBandsSql + {
        val nEqSql = (0 until Dedup.MinhashK).map(i =>
          s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
        s""", mcand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |    FROM bands a JOIN bands b USING (band, m0, m1)
           |    WHERE a.doc_id < b.doc_id),
           |mcnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           |minter AS (SELECT doc_a, doc_b, count(*) AS inter
           |    FROM mcand JOIN sh sa ON sa.doc_id = doc_a
           |    JOIN sh sb ON sb.doc_id = doc_b AND sb.sh = sa.sh
           |    GROUP BY 1, 2),
           |mpair AS (SELECT cast($nEqSql AS BIGINT) AS n_eq,
           |    coalesce(i.inter, 0) * 1000000 //
           |      (ca.n + cb.n - coalesce(i.inter, 0)) AS jacc_ppm
           |  FROM mcand c
           |  JOIN mh a ON c.doc_a = a.doc_id
           |  JOIN mh b ON c.doc_b = b.doc_id
           |  JOIN mcnt ca ON c.doc_a = ca.doc_id
           |  JOIN mcnt cb ON c.doc_b = cb.doc_id
           |  LEFT JOIN minter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b)
           |SELECT n_eq,
           |  cast(n_eq * 1000000 // ${Dedup.MinhashK} AS BIGINT) AS est_ppm,
           |  cast(count(*) AS BIGINT) AS n_pairs,
           |  cast(sum(jacc_ppm) // count(*) AS BIGINT) AS mean_true_ppm
           |FROM mpair GROUP BY n_eq""".stripMargin
      }),

    // ── WITHIN-document repeated-chunk removal (page-grain scrub) ──────
    // C4's "remove repeated lines within a page" tier: the first
    // occurrence of each 16-token chunk INSIDE a document survives,
    // later repeats are cut — and, the contract difference vs q132's
    // cross-document tier, the same chunk in two documents stays in
    // both. Within-doc loops are injected (doc_id % 9 = 4 docs become
    // their own first 16 tokens repeated 3×, q64's discipline) so the
    // oracle proves repeats collapse to one chunk. Same plan class as
    // q132; the window key CONTAINS doc_id so groups are per-document.
    "q162_within_doc_dedup" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val t = split(col("text"), " ")
        val rep = org.apache.spark.sql.functions.array_join(
          org.apache.spark.sql.functions.slice(t, 1, 16), " ")
        val injected = when(col("doc_id") % 9 === 4 && size(t) >= 16,
          concat(rep, lit(" "), rep, lit(" "), rep)).otherwise(col("text"))
        TextAnalysis.dedupParagraphsWithinDoc(
          docs.select(col("doc_id"), injected.as("text")), chunkTok = 16)
      },
      """WITH inj AS (SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 4 AND len(t) >= 16
        |         THEN array_to_string(t[1:16], ' ') || ' ' ||
        |              array_to_string(t[1:16], ' ') || ' ' ||
        |              array_to_string(t[1:16], ' ')
        |         ELSE text END AS text
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t
        |        FROM documents)),
        |ch AS (SELECT doc_id, cast((s - 1) // 16 AS BIGINT) AS chunk_id,
        |    array_to_string(t[s:s+15], ' ') AS chunk_text
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1, 16)) AS s
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM inj))),
        |keptch AS (SELECT doc_id, chunk_id, chunk_text FROM (
        |  SELECT doc_id, chunk_id, chunk_text,
        |    row_number() OVER (PARTITION BY doc_id, md5(chunk_text)
        |      ORDER BY chunk_id) AS rk
        |  FROM ch) WHERE rk = 1),
        |stitched AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_kept,
        |    string_agg(chunk_text, ' ' ORDER BY chunk_id) AS text_clean
        |  FROM keptch GROUP BY doc_id),
        |tot AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_ch
        |        FROM ch GROUP BY doc_id)
        |SELECT t.doc_id,
        |  t.n_ch - coalesce(st.n_kept, 0) AS n_removed_chunks,
        |  coalesce(st.text_clean, '') AS text_clean
        |FROM tot t LEFT JOIN stitched st USING (doc_id)""".stripMargin),

    // ── curriculum-ordered training shards ─────────────────────────────
    // Curriculum learning as a pure LAYOUT property: q124's
    // shuffle-shard with the within-shard order keyed by quality tier
    // FIRST (q131's linear classifier scores → 3 tiers), hash-shuffled
    // within each tier — the training reader streams pos order and
    // sees high-quality documents before low, with zero reader-side
    // logic. Shard assignment stays the independent hash stream, so
    // tiers balance across shards by construction. The oracle
    // rederives scoring, tiering, and the shard/pos arithmetic.
    "q163_curriculum_shards" -> Q(
      (s, dir) => {
        val scored = TextAnalysis.linearQualityScore(Tables.documents(s, dir),
          TextAnalysis.DefaultQualityWeights, bias = 0L)
        val tier = when(col("score_raw") > 20, lit(0L))
          .when(col("score_raw") > 0, lit(1L)).otherwise(lit(2L))
        Sampling.curriculumShards(
          scored.select(col("doc_id"), tier.as("tier")),
          "doc_id", nShards = 4, col("tier"))
      },
      {
        val w = TextAnalysis.DefaultQualityWeights
        val d = w.length
        s"""WITH tf AS (SELECT doc_id, tok
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |        FROM documents) WHERE len(tok) > 0),
           |sc AS (SELECT doc_id, cast(sum(([${w.mkString(", ")}])[
           |      cast(${sqlHash64("tok")} % $d AS INT) + 1]) AS BIGINT)
           |      AS score_raw
           |  FROM tf GROUP BY doc_id),
           |sct AS (SELECT d.doc_id,
           |    cast(CASE WHEN coalesce(sc.score_raw, 0) > 20 THEN 0
           |         WHEN coalesce(sc.score_raw, 0) > 0 THEN 1
           |         ELSE 2 END AS BIGINT) AS tier
           |  FROM documents d LEFT JOIN sc USING (doc_id))
           |SELECT doc_id, tier,
           |  ${Sampling.rowHashSql("doc_id", "shard")} % 4 AS shard,
           |  row_number() OVER (
           |    PARTITION BY ${Sampling.rowHashSql("doc_id", "shard")} % 4
           |    ORDER BY tier, ${Sampling.rowHashSql("doc_id", "shard:order")},
           |      doc_id) - 1 AS pos
           |FROM sct""".stripMargin
      }),

    // ── ANN recall@k report (index quality measurement) ────────────────
    // The number that justifies an approximate index before it serves
    // production: per query, how many of the exact top-k (q35's brute
    // force, the ground truth) the IVF probe (q36, nprobe=1) recovered
    // — exact integer ppm. Both inputs are top-k-bounded by
    // construction, so the comparison join and rollup are
    // query-count-sized at any corpus scale; the oracle replays BOTH
    // rankers and the intersection. The q161 calibration discipline
    // applied to the vector side.
    "q164_ann_recall" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.recallReport(
          Similarity.ivfTopK(emb, nCentroids = 64, nQueries = 8, k = 3),
          Similarity.bruteForceTopK(emb, nQueries = 8, k = 3), k = 3)
      },
      """WITH e AS (SELECT vec_id, q FROM (SELECT vec_id,
        |    list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
        |    FROM embeddings) WHERE list_dot_product(q, q) > 0),
        |bsc AS (SELECT qs.vec_id AS q_id, e2.vec_id,
        |    list_dot_product(qs.q, e2.q)
        |      / (sqrt(list_dot_product(qs.q, qs.q)) * sqrt(list_dot_product(e2.q, e2.q))) AS cos
        |  FROM e qs JOIN e e2 ON qs.vec_id < 8 AND e2.vec_id != qs.vec_id),
        |bt AS (SELECT q_id, vec_id FROM (
        |  SELECT q_id, vec_id, row_number() OVER (
        |    PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank FROM bsc)
        |  WHERE rank <= 3),
        |assign AS (SELECT vec_id, q, cluster FROM (
        |    SELECT e.vec_id, e.q, c.vec_id AS cluster,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(c.q, e.q)
        |          / (sqrt(list_dot_product(c.q, c.q)) * sqrt(list_dot_product(e.q, e.q))) DESC,
        |        c.vec_id) AS arn
        |    FROM e JOIN e c ON c.vec_id < 64)
        |  WHERE arn = 1),
        |isc AS (SELECT qs.vec_id AS q_id, v.vec_id,
        |    list_dot_product(qs.q, v.q)
        |      / (sqrt(list_dot_product(qs.q, qs.q)) * sqrt(list_dot_product(v.q, v.q))) AS cos
        |  FROM assign qs JOIN assign v
        |    ON qs.vec_id < 8 AND v.cluster = qs.cluster AND v.vec_id != qs.vec_id),
        |it AS (SELECT q_id, vec_id FROM (
        |  SELECT q_id, vec_id, row_number() OVER (
        |    PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank FROM isc)
        |  WHERE rank <= 3)
        |SELECT b.q_id,
        |  cast(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |  cast(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000 // 3 AS BIGINT) AS recall_ppm
        |FROM bt b LEFT JOIN it i ON b.q_id = i.q_id AND b.vec_id = i.vec_id
        |GROUP BY b.q_id""".stripMargin),

    // ── per-shard release MANIFEST (integrity artifact) ────────────────
    // The file a training reader validates before consuming a shard:
    // per shard, doc count, token count, and an ORDER-INDEPENDENT
    // xor-of-row-hashes checksum (exact under any partitioning — the
    // Bench harness's own full-eval discipline). Rows bind id AND
    // content, so a swapped or truncated row flips the checksum. One
    // metadata-sized rollup on top of q124's shard arithmetic.
    "q165_shard_manifest" -> Q(
      (s, dir) => graft.streaming.StreamIngest.manifestOf(
        Sampling.shuffleShards(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "doc_id", nShards = 8)),
      s"""WITH m AS (SELECT doc_id, text,
         |    cast(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         |    ${Sampling.rowHashSql("doc_id", "shard")} % 8 AS shard,
         |    ${sqlHash64("cast(doc_id AS VARCHAR) || ':' || text")} AS h
         |  FROM documents)
         |SELECT shard, cast(count(*) AS BIGINT) AS n_docs,
         |  cast(sum(n_toks) AS BIGINT) AS n_tokens,
         |  cast(bit_xor(h) AS BIGINT) AS checksum
         |FROM m GROUP BY shard""".stripMargin),

    // ── domain blocklist filter (crawl hygiene) ────────────────────────
    // The first gate of a crawl pipeline: canonical URL → domain →
    // drop everything on the blocklist. The blocklist is a RELATION
    // (not an isin literal) because production lists are maintained
    // tables of thousands of domains — the plan must be a broadcast
    // ANTI join, never a corpus-side scan predicate rebuilt per
    // release. URL synthesis is q158's; domain extraction one regex.
    "q166_blocklist_filter" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val url = concat(lit("https://"),
          when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
          col("source"), lit(".Example.com/p/"),
          (col("doc_id") % 100).cast("string"))
        val domain = org.apache.spark.sql.functions.regexp_extract(
          TextAnalysis.canonicalUrlCol(url), "://([^/]+)", 1)
        val blocklist = s.createDataFrame(
          Seq("src3.example.com", "src7.example.com", "src11.example.com")
            .map(Tuple1(_))).toDF("domain")
        docs.select(col("doc_id"), domain.as("domain"))
          .join(org.apache.spark.sql.functions.broadcast(blocklist),
            Seq("domain"), "left_anti")
          .select(col("doc_id"), col("domain"))
      },
      {
        val urlSql = "'https://' || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' " +
          "ELSE '' END) || source || '.Example.com/p/' || " +
          "cast(doc_id % 100 AS VARCHAR)"
        // raw-url CTE: the q158 binder-depth discipline
        s"""WITH raw AS (SELECT doc_id, $urlSql AS url_raw FROM documents),
           |dom AS (SELECT doc_id, regexp_extract(
           |    ${TextAnalysis.canonicalUrlSql("url_raw")}, '://([^/]+)', 1)
           |    AS domain
           |  FROM raw)
           |SELECT doc_id, domain FROM dom
           |WHERE domain NOT IN ('src3.example.com', 'src7.example.com',
           |                     'src11.example.com')""".stripMargin
      }),

    // ── per-document n-gram novelty in corpus order ────────────────────
    // Diversity accumulation analytics (WIMBD-class): the share of each
    // document's distinct 5-grams whose FIRST corpus occurrence is this
    // document — template-heavy corpora decay toward 0 in id order,
    // fresh content holds near 10⁶ ppm. Order-aware complement of
    // q140's order-agnostic boilerplate coverage: there a shared gram
    // counts against BOTH docs, here the first holder keeps credit.
    // Grams shuffle as 64-bit hashes on both engines.
    "q167_ngram_novelty" -> Q(
      (s, dir) => TextAnalysis.ngramNovelty(Tables.documents(s, dir), n = 5),
      s"""WITH sh AS (SELECT DISTINCT doc_id,
         |    ${sqlHash64("array_to_string(t[i:i+4], ' ')")} AS gh
         |  FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t)-3, 1))) AS i
         |        FROM (SELECT doc_id, string_split(text, ' ') AS t
         |              FROM documents))),
         |firsts AS (SELECT gh, min(doc_id) AS first_doc FROM sh GROUP BY gh),
         |per AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_grams,
         |    cast(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_novel
         |  FROM sh JOIN firsts USING (gh) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(p.n_grams, cast(0 AS BIGINT)) AS n_grams,
         |  coalesce(p.n_novel, cast(0 AS BIGINT)) AS n_novel,
         |  coalesce(p.n_novel * 1000000 // p.n_grams, cast(0 AS BIGINT))
         |    AS novelty_ppm
         |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin),

    // ── per-document tf·idf keyword extraction ─────────────────────────
    // Tagging/labeling color for dataset cards: each document's 3 most
    // distinctive tokens by exact-integer tf·idf (q63's idf
    // discipline), ties broken on token BYTES (the collation
    // discipline) so the cutoff agrees cross-engine. Rank-limited
    // per-doc window (WindowGroupLimit); df is a vocabulary-sized
    // aggregate of the index joined back token-keyed.
    "q168_tfidf_keywords" -> Q(
      (s, dir) => graft.mart.TextIndex.tfidfKeywords(
        graft.mart.TextIndex.build(Tables.documents(s, dir)), topK = 3),
      """WITH ti AS (
        |  SELECT token, doc_id, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE length(token) > 0
        |  GROUP BY 1, 2),
        |dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM ti GROUP BY token),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM ti),
        |sc AS (SELECT doc_id, token,
        |    cast(tf * (((SELECT n_docs FROM nd) * 1000) // df) AS BIGINT) AS score
        |  FROM ti JOIN dfq USING (token)),
        |rk AS (SELECT doc_id, token, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, token) AS rank
        |  FROM sc)
        |SELECT doc_id, token, score, cast(rank AS BIGINT) AS rank
        |FROM rk WHERE rank <= 3""".stripMargin),

    // ── language-ID confusion matrix ───────────────────────────────────
    // The measurement behind trusting q37's router: labeled lang ×
    // guessed lang counts with per-label row shares in exact ppm — the
    // report that says WHERE the classifier errs (which pairs confuse),
    // not just how often. One corpus scan + one metadata-sized rollup;
    // the share window runs over the |langs|² result.
    "q169_lang_confusion" -> Q(
      (s, dir) => TextAnalysis.langId(Tables.documents(s, dir))
        .groupBy(col("lang"), col("lang_guess"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("row_ppm", org.apache.spark.sql.functions.expr(
          "n_docs * 1000000 div sum(n_docs) over (partition by lang)")),
      {
        def occ(w: String) =
          s"((length(text) - length(replace(text, '$w', ''))) / ${w.length})"
        val scores = TextAnalysis.LangMarkers.map { case (lang, ws) =>
          s"${ws.map(occ).mkString(" + ")} AS sc_$lang"
        }.mkString(", ")
        val langs = TextAnalysis.LangMarkers.map(_._1)
        val guess = langs.tail.foldLeft((s"'${langs.head}'", s"sc_${langs.head}")) {
          case ((bl, bs), lang) =>
            (s"(CASE WHEN sc_$lang > $bs THEN '$lang' ELSE $bl END)",
              s"greatest($bs, sc_$lang)")
        }._1
        s"""WITH sc AS (SELECT doc_id, lang, text, $scores FROM documents),
           |cm AS (SELECT lang, $guess AS lang_guess,
           |    cast(count(*) AS BIGINT) AS n_docs
           |  FROM sc GROUP BY 1, 2)
           |SELECT lang, lang_guess, n_docs,
           |  cast(n_docs * 1000000 // sum(n_docs) OVER (PARTITION BY lang)
           |       AS BIGINT) AS row_ppm
           |FROM cm""".stripMargin
      }),

    // ── PII audit report per language (compliance artifact) ────────────
    // Release compliance wants the histogram, not just scrubbed text:
    // per language, match counts and affected-document counts for each
    // PII class. Typed PII is injected on disjoint id residues (q64's
    // discipline) so every class exercises non-uniformly; counts run
    // on the SAME fused projection (one corpus scan + one rollup).
    "q170_pii_report" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val id = col("doc_id").cast("string")
        val injected = concat(col("text"),
          when(col("doc_id") % 13 === 5,
            concat(lit(" contact p"), id, lit("@mail.example.org")))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 3,
            concat(lit(" from 192.168."), (col("doc_id") % 256).cast("string"),
              lit(".9"))).otherwise(lit("")),
          when(col("doc_id") % 7 === 2,
            concat(lit(" call +49301234"), id)).otherwise(lit("")))
        val counted = docs.select(Seq(col("lang")) ++
          TextAnalysis.PiiPatterns.map { case (name, re, _) =>
            org.apache.spark.sql.functions.regexp_count(injected, lit(re))
              .cast("long").as(s"n_$name")
          }: _*)
        val aggs = TextAnalysis.PiiPatterns.map { case (name, _, _) =>
          sum(col(s"n_$name")).as(s"${name}_hits")
        } ++ TextAnalysis.PiiPatterns.map { case (name, _, _) =>
          sum(when(col(s"n_$name") > 0, 1L).otherwise(0L)).as(s"${name}_docs")
        }
        counted.groupBy(col("lang")).agg(aggs.head, aggs.tail: _*)
      },
      {
        val inj = "text || " +
          "(CASE WHEN doc_id % 13 = 5 THEN ' contact p' || cast(doc_id AS VARCHAR) || '@mail.example.org' ELSE '' END) || " +
          "(CASE WHEN doc_id % 11 = 3 THEN ' from 192.168.' || cast(doc_id % 256 AS VARCHAR) || '.9' ELSE '' END) || " +
          "(CASE WHEN doc_id % 7 = 2 THEN ' call +49301234' || cast(doc_id AS VARCHAR) ELSE '' END)"
        val counts = TextAnalysis.PiiPatterns.map { case (name, re, _) =>
          s"cast(len(regexp_extract_all(t, '$re')) AS BIGINT) AS n_$name"
        }.mkString(", ")
        val aggs = TextAnalysis.PiiPatterns.map { case (name, _, _) =>
          s"cast(sum(n_$name) AS BIGINT) AS ${name}_hits"
        }.mkString(", ") + ", " +
          TextAnalysis.PiiPatterns.map { case (name, _, _) =>
            s"cast(sum(CASE WHEN n_$name > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ${name}_docs"
          }.mkString(", ")
        s"""WITH c AS (SELECT lang, $counts
           |  FROM (SELECT doc_id, lang, $inj AS t FROM documents))
           |SELECT lang, $aggs FROM c GROUP BY lang""".stripMargin
      }),

    // ── exact-duplicate rate per source (operations report) ────────────
    // WHERE duplication comes from: per source, doc count, distinct
    // content count, and the duplicate share in exact ppm — the report
    // that points a crawl operator at the mirroring feed. Exact
    // duplicates are injected (doc_id % 6 = 1 docs re-appear under
    // +40000 ids with identical text — the fixture has no natural
    // byte-identical pairs, q154's discipline); distinct-hash counting
    // is q30's key arithmetic rolled up per source.
    "q171_dup_rate_by_source" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val dupes = docs.where(col("doc_id") % 6 === 1)
          .select((col("doc_id") + 40000).as("doc_id"), col("text"),
            col("source"))
        docs.select(col("doc_id"), col("text"), col("source"))
          .unionByName(dupes)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(org.apache.spark.sql.functions.md5(col("text")))
              .as("n_unique"))
          .withColumn("dup_ppm",
            org.apache.spark.sql.functions.expr(
              "(n_docs - n_unique) * 1000000 div n_docs"))
      },
      """WITH u AS (SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 40000, text, source FROM documents
        |  WHERE doc_id % 6 = 1),
        |g AS (SELECT source, cast(count(*) AS BIGINT) AS n_docs,
        |    cast(count(DISTINCT md5(text)) AS BIGINT) AS n_unique
        |  FROM u GROUP BY source)
        |SELECT source, n_docs, n_unique,
        |  (n_docs - n_unique) * 1000000 // n_docs AS dup_ppm
        |FROM g""".stripMargin),

    // ── token-length histogram per language (dataset-card color) ───────
    // Doc counts and token mass per (lang, log2 length bucket) — the
    // distribution plot every dataset card ships. The bucket is
    // floor(log2(n_tokens)): exact at the only dangerous boundary
    // (powers of two are exactly representable and log2 of them is
    // exact in IEEE), interior everywhere else — cross-engine safe.
    // One scan, one metadata-sized rollup.
    "q172_length_histogram" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("n"))
        .groupBy(col("lang"), org.apache.spark.sql.functions.expr(
          "cast(floor(log2(n)) AS BIGINT)").as("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens")),
      """SELECT lang, cast(floor(log2(n)) AS BIGINT) AS bucket,
        |  cast(count(*) AS BIGINT) AS n_docs,
        |  cast(sum(n) AS BIGINT) AS n_tokens
        |FROM (SELECT lang, cast(len(string_split(text, ' ')) AS BIGINT) AS n
        |      FROM documents)
        |GROUP BY 1, 2""".stripMargin),

    // ── token-BALANCED shards (anti-straggler layout) ──────────────────
    // Distributed training wants equal TOKEN mass per rank; hash
    // sharding (q124) only concentrates there by LLN (~1/sqrt(docs per
    // shard) — tail risk below millions of docs/shard). Here balance is
    // a construction: log2-length buckets × hash stripes, each cell
    // round-robining its docs across shards in salted-hash order —
    // per-shard mass bounded by #cells × bucket width,
    // deterministically, on any engine. One bounded-cardinality window
    // exchange. The oracle replays bucket, stripe, rank, and the
    // round-robin at doc grain.
    "q173_balanced_shards" -> Q(
      (s, dir) => Sampling.balancedShards(
        Tables.documents(s, dir).select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", nShards = 8, nStripes = 4),
      s"""SELECT doc_id, n_tokens,
         |  ${Sampling.balancedShardSql("doc_id", "n_tokens", nShards = 8,
              nStripes = 4)} AS shard
         |FROM (SELECT doc_id,
         |    cast(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents)""".stripMargin),

    // ── LSH band-load histogram (candidate-volume forecast) ────────────
    // The capacity-planning report read BEFORE committing a banded
    // dedup run at 100 TB: bucket-size histogram of the minhash band
    // relation plus each size's pair contribution s·(s−1)/2 — the sum
    // IS the candidate volume the q32/q120 joins will generate, so a
    // hot band shows up here as budget, not as a surprise mid-job.
    // Output is ≤ distinct-sizes rows; exact integer arithmetic.
    "q174_band_load_histogram" -> Q(
      (s, dir) => Dedup.minhashBands(Tables.documents(s, dir), n = 3)
        .groupBy(col("band"), col("m0"), col("m1"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("bucket_size"))
        .agg(count(lit(1)).as("n_buckets"))
        .select(col("bucket_size"), col("n_buckets"),
          org.apache.spark.sql.functions.expr(
            "bucket_size * (bucket_size - 1) div 2 * n_buckets")
            .as("pairs_contrib")),
      shingleBase3 + minhashBandsSql +
        """, bsz AS (SELECT band, m0, m1, cast(count(*) AS BIGINT) AS sz
          |          FROM bands GROUP BY 1, 2, 3)
          |SELECT sz AS bucket_size, cast(count(*) AS BIGINT) AS n_buckets,
          |  cast(sz * (sz - 1) // 2 * count(*) AS BIGINT) AS pairs_contrib
          |FROM bsz GROUP BY sz""".stripMargin),

    // ── ANN recall vs probe width (the recall/cost knob, measured) ─────
    // q164 prices ONE operating point; the decision an operator
    // actually makes is nprobe — probing more IVF partitions buys
    // recall with candidate volume. This emits recall@3 per query at
    // nprobe = 1 and 2 in one report, the measured curve behind the
    // knob. The oracle replays both probe widths (per-query centroid
    // ranking prn <= np over the same assignment relation).
    "q175_ann_nprobe_sweep" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val truth = Similarity.bruteForceTopK(emb, nQueries = 8, k = 3)
        Seq(1, 2, 4).map { np =>
          Similarity.recallReport(
            Similarity.ivfTopK(emb, nCentroids = 64, nQueries = 8, k = 3,
              nprobe = np), truth, k = 3)
            .withColumn("nprobe", lit(np.toLong))
        }.reduce(_ unionByName _)
      },
      """WITH e AS (SELECT vec_id, q FROM (SELECT vec_id,
        |    list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
        |    FROM embeddings) WHERE list_dot_product(q, q) > 0),
        |bsc AS (SELECT qs.vec_id AS q_id, e2.vec_id,
        |    list_dot_product(qs.q, e2.q)
        |      / (sqrt(list_dot_product(qs.q, qs.q)) * sqrt(list_dot_product(e2.q, e2.q))) AS cos
        |  FROM e qs JOIN e e2 ON qs.vec_id < 8 AND e2.vec_id != qs.vec_id),
        |bt AS (SELECT q_id, vec_id FROM (
        |  SELECT q_id, vec_id, row_number() OVER (
        |    PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank FROM bsc)
        |  WHERE rank <= 3),
        |assign AS (SELECT vec_id, q, cluster FROM (
        |    SELECT e.vec_id, e.q, c.vec_id AS cluster,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(c.q, e.q)
        |          / (sqrt(list_dot_product(c.q, c.q)) * sqrt(list_dot_product(e.q, e.q))) DESC,
        |        c.vec_id) AS arn
        |    FROM e JOIN e c ON c.vec_id < 64)
        |  WHERE arn = 1),
        |qc AS (SELECT qs.vec_id AS q_id, qs.q AS qq, c.vec_id AS cluster,
        |    row_number() OVER (PARTITION BY qs.vec_id ORDER BY
        |      list_dot_product(c.q, qs.q)
        |        / (sqrt(list_dot_product(c.q, c.q)) * sqrt(list_dot_product(qs.q, qs.q))) DESC,
        |      c.vec_id) AS prn
        |  FROM e qs JOIN e c ON qs.vec_id < 8 AND c.vec_id < 64),
        |probes AS (SELECT np, q_id, qq, cluster
        |  FROM (SELECT unnest([1, 2, 4]) AS np), qc WHERE prn <= np),
        |isc AS (SELECT p.np, p.q_id, v.vec_id,
        |    list_dot_product(p.qq, v.q)
        |      / (sqrt(list_dot_product(p.qq, p.qq)) * sqrt(list_dot_product(v.q, v.q))) AS cos
        |  FROM probes p JOIN assign v
        |    ON v.cluster = p.cluster AND v.vec_id != p.q_id),
        |it AS (SELECT np, q_id, vec_id FROM (
        |  SELECT np, q_id, vec_id, row_number() OVER (
        |    PARTITION BY np, q_id ORDER BY cos DESC, vec_id) AS rank FROM isc)
        |  WHERE rank <= 3)
        |SELECT cast(n.np AS BIGINT) AS nprobe, b.q_id,
        |  cast(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |  cast(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000 // 3 AS BIGINT) AS recall_ppm
        |FROM (SELECT unnest([1, 2, 4]) AS np) n
        |CROSS JOIN bt b
        |LEFT JOIN it i ON i.np = n.np AND b.q_id = i.q_id AND b.vec_id = i.vec_id
        |GROUP BY n.np, b.q_id""".stripMargin),

    // ── dynamic percentile quality threshold (drop the bottom decile) ──
    // Fixed thresholds (q131's score > 0) drift as the corpus mix
    // shifts; production gates are PERCENTILE thresholds re-derived per
    // release. Computed scale-safely: no global sort/rank — scores are
    // bounded integers, so the distribution is a metadata-sized
    // HISTOGRAM (distinct-scores rows); the cumulative window runs over
    // that histogram and the resulting one-row threshold broadcasts
    // back as a filter. Ties at the threshold all drop (deterministic).
    // Exact integer arithmetic end to end — the oracle rederives the
    // histogram, the cut point, and the filter.
    "q176_quantile_gate" -> Q(
      (s, dir) => {
        val scored = TextAnalysis.linearQualityScore(Tables.documents(s, dir),
          TextAnalysis.DefaultQualityWeights, bias = 0L)
          .select(col("doc_id"), col("score_raw"))
        val hist = scored.groupBy(col("score_raw"))
          .agg(count(lit(1)).as("cnt"))
        val cum = hist.withColumn("cum",
          org.apache.spark.sql.functions.expr(
            "sum(cnt) over (order by score_raw)"))
          .withColumn("tot",
            org.apache.spark.sql.functions.expr("sum(cnt) over ()"))
        val thr = cum.where(col("cum") * 10 >= col("tot"))
          .agg(org.apache.spark.sql.functions.min(col("score_raw")).as("thr"))
        scored.join(org.apache.spark.sql.functions.broadcast(thr))
          .where(col("score_raw") > col("thr"))
          .select(col("doc_id"), col("score_raw"))
      },
      {
        val w = TextAnalysis.DefaultQualityWeights
        val d = w.length
        s"""WITH tf AS (SELECT doc_id, tok
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |        FROM documents) WHERE len(tok) > 0),
           |sc AS (SELECT d.doc_id, cast(coalesce(s.sr, 0) AS BIGINT) AS score_raw
           |  FROM documents d LEFT JOIN (
           |    SELECT doc_id, sum(([${w.mkString(", ")}])[
           |      cast(${sqlHash64("tok")} % $d AS INT) + 1]) AS sr
           |    FROM tf GROUP BY doc_id) s USING (doc_id)),
           |hist AS (SELECT score_raw, cast(count(*) AS BIGINT) AS cnt
           |         FROM sc GROUP BY score_raw),
           |cum AS (SELECT score_raw,
           |    sum(cnt) OVER (ORDER BY score_raw) AS cum,
           |    sum(cnt) OVER () AS tot
           |  FROM hist),
           |thr AS (SELECT min(score_raw) AS t FROM cum WHERE cum * 10 >= tot)
           |SELECT doc_id, score_raw FROM sc
           |WHERE score_raw > (SELECT t FROM thr)""".stripMargin
      }),

    // ── reference-LM affinity scoring (the CCNet discipline) ───────────
    // q67 trains the bigram model on the corpus ITSELF — a large junk
    // cluster legitimizes its own distribution. Production filtering
    // trains on a curated clean REFERENCE (here: the src0-3 slice,
    // a deterministic 20%) and scores every document against THAT
    // model; reference-absent bigrams contribute 0 (exact zero-backoff
    // — smoothing is an FP-model concern). Same exact integer
    // arithmetic as q67; the oracle trains and scores from the same
    // reference CTE.
    "q177_reference_lm" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.bigramAffinityAgainst(docs,
          docs.where(col("source").isin("src0", "src1", "src2", "src3")))
      },
      """WITH rtoks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')),
        |rbg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |        FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |              FROM rtoks WHERE len(t) >= 2)),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM rbg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM rbg GROUP BY 1),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |             FROM toks WHERE len(t) >= 2)),
        |p AS (SELECT bg.doc_id,
        |    coalesce((c2.c2 * 1000000) // c1.c1, 0) AS p_scaled
        |  FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)),
        |agg AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_bigrams,
        |               cast(sum(p_scaled) AS BIGINT) AS sum_p
        |        FROM p GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, sum_p,
        |       cast(sum_p AS DOUBLE) / n_bigrams / 1000000.0 AS affinity
        |FROM agg""".stripMargin),

    // ── TRAINED language router (hashed linear model, train/holdout) ───
    // q37's marker-word heuristic is oracle-correct but q169 measures
    // its weak diagonal honestly — and the weakness is STRUCTURAL: the
    // fixture's lang label is independent of its text (a full NB
    // trained on the corpus itself reads 47%, the majority-class
    // rate). The trained router therefore exercises against an
    // injected signal (q64/q131 typed-injection discipline; see
    // TextAnalysis.trainedLangId): strong marker phrases on most docs,
    // WEAK ones on the doc_id%20=3 slice (the hard subset), per-lang
    // ppm weight vectors trained in-query on the even-id half, argmax
    // scoring on the held-out odd half. One corpus scan; the weight
    // relation is ≤ |langs|·256 rows and broadcasts; argmax is the
    // q139 encoding aggregate. The oracle replays injection → hashing
    // → training → scoring from the same shared constants.
    "q178_trained_langid" -> Q(
      (s, dir) => TextAnalysis.trainedLangId(Tables.documents(s, dir)),
      s"""WITH $trainedLangCtes
         |SELECT doc_id, lang, lang_pred, lang = lang_pred AS is_match
         |FROM pred""".stripMargin),

    // The q169-shape confusion matrix of the TRAINED router on its
    // holdout — the measurement that justifies routing a corpus with
    // it (diagonal ≥ 0.9 per label on the fixture, spec-pinned; the
    // off-diagonal mass comes from the deliberately weak-marked hard
    // subset). Metadata-sized rollup over the q178 relation.
    "q179_trained_confusion" -> Q(
      (s, dir) => TextAnalysis.trainedLangId(Tables.documents(s, dir))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("row_ppm", org.apache.spark.sql.functions.expr(
          "n_docs * 1000000 div sum(n_docs) over (partition by lang)")),
      s"""WITH $trainedLangCtes,
         |lcm AS (SELECT lang, lang_pred, cast(count(*) AS BIGINT) AS n_docs
         |        FROM pred GROUP BY 1, 2)
         |SELECT lang, lang_pred, n_docs,
         |  cast(n_docs * 1000000 // sum(n_docs) OVER (PARTITION BY lang)
         |       AS BIGINT) AS row_ppm
         |FROM lcm""".stripMargin),

    // ── sequence-packing efficiency report ─────────────────────────────
    // What a trainer wastes per shard: q149's layout cuts documents
    // across boundaries, so only each shard's LAST sequence can be
    // partial — but the report derives n_full/waste generically from
    // the packed relation, so it prices ANY packing layout. A reader
    // padding partial sequences to the context length pays waste_ppm
    // of its token budget; ≤ |shards| output rows at any corpus scale.
    "q182_packing_efficiency" -> Q(
      (s, dir) => SeqPack.packSequences(Tables.documents(s, dir), "doc_id",
          "text", shards = 8, seqLen = 256)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_seqs"),
          sum(when(col("n_tok_filled") === 256, 1L).otherwise(0L)).as("n_full"),
          sum(col("n_tok_filled")).as("n_tokens"))
        .withColumn("waste_ppm", org.apache.spark.sql.functions.expr(
          "(n_seqs * 256 - n_tokens) * 1000000 div (n_seqs * 256)")),
      s"""WITH pk AS (
         |${SeqPack.packSequencesOracleSql("documents", "doc_id", "text", 8, 256)})
         |SELECT shard, cast(count(*) AS BIGINT) AS n_seqs,
         |  cast(sum(CASE WHEN n_tok_filled = 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
         |  cast(sum(n_tok_filled) AS BIGINT) AS n_tokens,
         |  cast((count(*) * 256 - sum(n_tok_filled)) * 1000000
         |       // (count(*) * 256) AS BIGINT) AS waste_ppm
         |FROM pk GROUP BY shard""".stripMargin),

    // ── per-LANGUAGE percentile quality gate ───────────────────────────
    // q176's decile cut is global — on a multilingual corpus that
    // deletes whole low-scoring languages instead of each language's
    // own bottom decile. Same bounded-integer histogram discipline,
    // keyed by lang: the per-lang cumulative cut runs over a
    // |langs|·|distinct scores| metadata relation and the |langs|-row
    // threshold relation broadcasts back as the filter. The score
    // rides the SAME one-scan projection as lang (linearScoreCol — no
    // corpus join-back).
    "q183_lang_quantile_gate" -> Q(
      (s, dir) => {
        graft.functions.Md5Prefix64.register(s)
        val scored = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          TextAnalysis.linearScoreCol(col("text"),
            TextAnalysis.DefaultQualityWeights).as("score_raw"))
        val hist = scored.groupBy(col("lang"), col("score_raw"))
          .agg(count(lit(1)).as("cnt"))
        val cum = hist
          .withColumn("cum", org.apache.spark.sql.functions.expr(
            "sum(cnt) over (partition by lang order by score_raw)"))
          .withColumn("tot", org.apache.spark.sql.functions.expr(
            "sum(cnt) over (partition by lang)"))
        val thr = cum.where(col("cum") * 10 >= col("tot"))
          .groupBy(col("lang"))
          .agg(org.apache.spark.sql.functions.min(col("score_raw")).as("thr"))
        scored.join(org.apache.spark.sql.functions.broadcast(thr), "lang")
          .where(col("score_raw") > col("thr"))
          .select(col("doc_id"), col("lang"), col("score_raw"))
      },
      {
        val w = TextAnalysis.DefaultQualityWeights
        val d = w.length
        s"""WITH tf AS (SELECT doc_id, tok
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |        FROM documents) WHERE len(tok) > 0),
           |sc AS (SELECT d.doc_id, d.lang,
           |    cast(coalesce(s.sr, 0) AS BIGINT) AS score_raw
           |  FROM documents d LEFT JOIN (
           |    SELECT doc_id, sum(([${w.mkString(", ")}])[
           |      cast(${sqlHash64("tok")} % $d AS INT) + 1]) AS sr
           |    FROM tf GROUP BY doc_id) s USING (doc_id)),
           |hist AS (SELECT lang, score_raw, cast(count(*) AS BIGINT) AS cnt
           |         FROM sc GROUP BY 1, 2),
           |cum AS (SELECT lang, score_raw,
           |    sum(cnt) OVER (PARTITION BY lang ORDER BY score_raw) AS cum,
           |    sum(cnt) OVER (PARTITION BY lang) AS tot
           |  FROM hist),
           |thr AS (SELECT lang, min(score_raw) AS t FROM cum
           |        WHERE cum * 10 >= tot GROUP BY lang)
           |SELECT sc.doc_id, sc.lang, sc.score_raw
           |FROM sc JOIN thr ON sc.lang = thr.lang AND sc.score_raw > thr.t""".stripMargin
      }),

    // ── vocabulary-growth curve (Heaps'-law report) ────────────────────
    // Distinct token types vs corpus size at doc-id-prefix powers of
    // two — the WIMBD-class diversity curve an operator reads to spot
    // a corpus going stale (new types flattening while tokens grow).
    // Types travel as 64-bit hashes (collisions merge identically on
    // both engines); the growth arithmetic runs over a ≤ 64-bucket
    // relation (exact log2 via binary digit count — no FP).
    "q184_vocab_growth" -> Q(
      (s, dir) => {
        graft.functions.Md5Prefix64.register(s)
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), explode(org.apache.spark.sql.functions.filter(
            split(col("text"), " "),
            t => length(t) > 0)).as("tok"))
          .select(col("doc_id"), Dedup.hash64(col("tok")).as("th"))
        val newTypes = toks.groupBy(col("th"))
          .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("first_doc"))
          .select(length(org.apache.spark.sql.functions.expr(
            "conv(first_doc + 1, 10, 2)")).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("new_types"))
        val tokMass = toks
          .select(length(org.apache.spark.sql.functions.expr(
            "conv(doc_id + 1, 10, 2)")).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n_tokens"))
        newTypes.join(tokMass, Seq("bucket"), "full")
          .select(col("bucket").cast("long").as("bucket"),
            coalesce(col("new_types"), lit(0L)).as("new_types"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
          .withColumn("cum_types", org.apache.spark.sql.functions.expr(
            "sum(new_types) over (order by bucket)"))
          .withColumn("cum_tokens", org.apache.spark.sql.functions.expr(
            "sum(n_tokens) over (order by bucket)"))
      },
      s"""WITH tf AS (SELECT doc_id, ${sqlHash64("tok")} AS th
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |        FROM documents) WHERE len(tok) > 0),
         |nt AS (SELECT cast(length(bin(first_doc + 1)) AS BIGINT) AS bucket,
         |         cast(count(*) AS BIGINT) AS new_types
         |       FROM (SELECT th, min(doc_id) AS first_doc FROM tf GROUP BY th)
         |       GROUP BY 1),
         |tm AS (SELECT cast(length(bin(doc_id + 1)) AS BIGINT) AS bucket,
         |         cast(count(*) AS BIGINT) AS n_tokens
         |       FROM tf GROUP BY 1)
         |SELECT coalesce(nt.bucket, tm.bucket) AS bucket,
         |  coalesce(new_types, 0) AS new_types,
         |  coalesce(n_tokens, 0) AS n_tokens,
         |  cast(sum(coalesce(new_types, 0))
         |       OVER (ORDER BY coalesce(nt.bucket, tm.bucket)) AS BIGINT) AS cum_types,
         |  cast(sum(coalesce(n_tokens, 0))
         |       OVER (ORDER BY coalesce(nt.bucket, tm.bucket)) AS BIGINT) AS cum_tokens
         |FROM nt FULL JOIN tm ON nt.bucket = tm.bucket""".stripMargin),

    // ── cross-source content-overlap matrix (mirror detection) ─────────
    // Which feeds mirror each other: per source pair, the count of
    // shared content hashes and the overlap share relative to the
    // smaller side. The fixture has no natural cross-source exact dups
    // (measured), so a mirror feed is INJECTED deterministically
    // (doc_id%7=2 docs re-appear verbatim under 'mirror_feed'; 7 is
    // coprime to the 20-way source cycle, so the mirror overlaps
    // EVERY source — the
    // q64 typed-injection discipline). Hash-only columns move, never
    // text (the q152 snapshot-diff economics); output is bounded by
    // |sources|² pairs with ≥ 1 shared hash.
    "q185_source_overlap" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val mirrored = docs.where(col("doc_id") % 7 === 2)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
            lit("mirror_feed").as("source"))
        val v = docs.select(col("doc_id"), col("text"), col("source"))
          .unionByName(mirrored)
        val h = v.select(col("source"),
          org.apache.spark.sql.functions.md5(col("text")).as("h")).distinct()
        val tot = h.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val shared = h.select(col("source").as("source_a"), col("h"))
          .join(h.select(col("source").as("source_b"), col("h")), "h")
          .where(col("source_a") < col("source_b"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("n_shared"))
        shared
          .join(tot.select(col("source").as("source_a"), col("n").as("n_a")), "source_a")
          .join(tot.select(col("source").as("source_b"), col("n").as("n_b")), "source_b")
          .select(col("source_a"), col("source_b"), col("n_shared"),
            col("n_a"), col("n_b"),
            org.apache.spark.sql.functions.expr(
              "n_shared * 1000000 div least(n_a, n_b)").as("overlap_ppm"))
      },
      """WITH v AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, 'mirror_feed' FROM documents
        |  WHERE doc_id % 7 = 2),
        |h AS (SELECT DISTINCT source, md5(text) AS h FROM v),
        |tot AS (SELECT source, cast(count(*) AS BIGINT) AS n FROM h GROUP BY 1),
        |sh AS (SELECT a.source AS source_a, b.source AS source_b,
        |         cast(count(*) AS BIGINT) AS n_shared
        |       FROM h a JOIN h b USING (h) WHERE a.source < b.source
        |       GROUP BY 1, 2)
        |SELECT source_a, source_b, n_shared, ta.n AS n_a, tb.n AS n_b,
        |  cast(n_shared * 1000000 // least(ta.n, tb.n) AS BIGINT) AS overlap_ppm
        |FROM sh JOIN tot ta ON source_a = ta.source
        |JOIN tot tb ON source_b = tb.source""".stripMargin),

    // ── DSIR-style importance selection against a target distribution ──
    // Data Selection via Importance Resampling, exact-integer variant:
    // hashed-token bucket frequencies of a curated TARGET slice
    // (source src0–src3, the q177 reference discipline) vs the whole
    // corpus; each document scores Σ_tokens (target_ppm − corpus_ppm)
    // — the linear analog of DSIR's log-ratio (log is an FP-model
    // concern; q208 is the exact-integer LOG variant that closes the
    // deviation) — and is kept by a deterministic
    // weighted Bernoulli: keep iff hash(doc) % 10⁶ < p_ppm, with
    // p_ppm = clamp(score, 0, CAP)·10⁶/CAP. One corpus scan; both
    // weight relations are ≤ 256 rows and broadcast; selection is a
    // pure projection — the whole recipe is scan + broadcast join +
    // rollup at any corpus scale.
    "q187_dsir_importance" -> Q(
      (s, dir) => {
        graft.functions.Md5Prefix64.register(s)
        val cap = 20000L
        val docs = Tables.documents(s, dir)
        val toks = docs.select(col("doc_id"), col("source"),
            explode(org.apache.spark.sql.functions.filter(
              split(col("text"), " "), t => length(t) > 0)).as("tok"))
          .select(col("doc_id"), col("source"),
            (Dedup.hash64(col("tok")) % 256).cast("int").as("bucket"))
        // bucket ppm with the total as a window over the ≤256-row
        // aggregate (metadata — no second corpus pass, no driver action)
        def ppm(src: org.apache.spark.sql.DataFrame) =
          src.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
            .select(col("bucket"),
              org.apache.spark.sql.functions.expr(
                "cnt * 1000000 div sum(cnt) over ()").as("w"))
        val refW = ppm(toks.where(col("source").isin("src0", "src1", "src2", "src3")))
          .withColumnRenamed("w", "wr")
        val corpW = ppm(toks).withColumnRenamed("w", "wc")
        val wts = refW.join(corpW, Seq("bucket"), "full")
          .select(col("bucket"),
            (coalesce(col("wr"), lit(0L)) - coalesce(col("wc"), lit(0L))).as("w"))
        val scored = toks.groupBy(col("doc_id"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
          .join(org.apache.spark.sql.functions.broadcast(wts), "bucket")
          .groupBy(col("doc_id"))
          .agg(sum(col("cnt") * col("w")).as("score_raw"))
        val pPpm = org.apache.spark.sql.functions.expr(
          s"least(greatest(score_raw, 0) * 1000000 div $cap, 1000000)")
        scored.select(col("doc_id"), col("score_raw"), pPpm.as("p_ppm"),
          (Sampling.rowHash(scored, col("doc_id"), "dsir") % 1000000L
            < pPpm).as("keep"))
      },
      {
        val cap = 20000L
        s"""WITH dt AS (SELECT doc_id, source,
           |    cast(${sqlHash64("tok")} % 256 AS INT) AS bucket
           |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
           |        FROM documents) WHERE len(tok) > 0),
           |rw AS (SELECT bucket,
           |         cast(count(*) * 1000000 // sum(count(*)) OVER () AS BIGINT) AS wr
           |       FROM dt WHERE source IN ('src0','src1','src2','src3')
           |       GROUP BY bucket),
           |cw AS (SELECT bucket,
           |         cast(count(*) * 1000000 // sum(count(*)) OVER () AS BIGINT) AS wc
           |       FROM dt GROUP BY bucket),
           |wt AS (SELECT coalesce(rw.bucket, cw.bucket) AS bucket,
           |         coalesce(wr, 0) - coalesce(wc, 0) AS w
           |       FROM rw FULL JOIN cw ON rw.bucket = cw.bucket),
           |dc AS (SELECT doc_id, bucket, cast(count(*) AS BIGINT) AS cnt
           |       FROM dt GROUP BY 1, 2),
           |sc AS (SELECT doc_id, cast(sum(cnt * w) AS BIGINT) AS score_raw
           |       FROM dc JOIN wt USING (bucket) GROUP BY doc_id),
           |pr AS (SELECT doc_id, score_raw,
           |    cast(least(greatest(score_raw, 0) * 1000000 // $cap, 1000000)
           |         AS BIGINT) AS p_ppm
           |  FROM sc)
           |SELECT doc_id, score_raw, p_ppm,
           |  ${Sampling.rowHashSql("doc_id", "dsir")} % 1000000 < p_ppm AS keep
           |FROM pr""".stripMargin
      }),

    // ── DSIR with the standard LOG-ratio weights, exact-integer ────────
    // q187's documented deviation closed: DSIR's importance weight is
    // log p_target(f) − log p_corpus(f); floating-point log is an
    // FP-model concern, so the log runs as BINARY DIGIT COUNT (the
    // q184 discipline): bitlen(x) = length(bin(x)) = ⌊log2 x⌋ + 1, at
    // CUBE resolution — w = bitlen((target_ppm+1)³) −
    // bitlen((corpus_ppm+1)³) ≈ 3·log2(target/corpus), i.e. ~1/3-bit
    // resolution per term, exact in BIGINT
    // ((10⁶+1)³ < 2⁶³), +1-smoothed so absent buckets contribute the
    // maximum penalty instead of −∞. Same plan shape as q187: one
    // corpus scan, two ≤256-row broadcast weight relations, projection
    // selection.
    "q208_dsir_log" -> Q(
      (s, dir) => {
        graft.functions.Md5Prefix64.register(s)
        val cap = 3000L
        val docs = Tables.documents(s, dir)
        val toks = docs.select(col("doc_id"), col("source"),
            explode(org.apache.spark.sql.functions.filter(
              split(col("text"), " "), t => length(t) > 0)).as("tok"))
          .select(col("doc_id"), col("source"),
            (Dedup.hash64(col("tok")) % 256).cast("int").as("bucket"))
        def ppm(src: org.apache.spark.sql.DataFrame) =
          src.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
            .select(col("bucket"),
              org.apache.spark.sql.functions.expr(
                "cnt * 1000000 div sum(cnt) over ()").as("w"))
        val refW = ppm(toks.where(col("source").isin("src0", "src1", "src2", "src3")))
          .withColumnRenamed("w", "wr")
        val corpW = ppm(toks).withColumnRenamed("w", "wc")
        def bitlen3(c: String) = org.apache.spark.sql.functions.expr(
          s"length(conv((coalesce($c, 0) + 1) * (coalesce($c, 0) + 1)" +
            s" * (coalesce($c, 0) + 1), 10, 2))").cast("long")
        val wts = refW.join(corpW, Seq("bucket"), "full")
          .select(col("bucket"), (bitlen3("wr") - bitlen3("wc")).as("w"))
        val scored = toks.groupBy(col("doc_id"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
          .join(org.apache.spark.sql.functions.broadcast(wts), "bucket")
          .groupBy(col("doc_id"))
          .agg(sum(col("cnt") * col("w")).as("score_raw"))
        val pPpm = org.apache.spark.sql.functions.expr(
          s"least(greatest(score_raw, 0) * 1000000 div $cap, 1000000)")
        scored.select(col("doc_id"), col("score_raw"), pPpm.as("p_ppm"),
          (Sampling.rowHash(scored, col("doc_id"), "dsirlog") % 1000000L
            < pPpm).as("keep"))
      },
      {
        val cap = 3000L
        def bitlen3(c: String) =
          s"cast(length(bin((coalesce($c, 0) + 1) * (coalesce($c, 0) + 1)" +
            s" * (coalesce($c, 0) + 1))) AS BIGINT)"
        s"""WITH dt AS (SELECT doc_id, source,
           |    cast(${sqlHash64("tok")} % 256 AS INT) AS bucket
           |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
           |        FROM documents) WHERE len(tok) > 0),
           |rw AS (SELECT bucket,
           |         cast(count(*) * 1000000 // sum(count(*)) OVER () AS BIGINT) AS wr
           |       FROM dt WHERE source IN ('src0','src1','src2','src3')
           |       GROUP BY bucket),
           |cw AS (SELECT bucket,
           |         cast(count(*) * 1000000 // sum(count(*)) OVER () AS BIGINT) AS wc
           |       FROM dt GROUP BY bucket),
           |wt AS (SELECT coalesce(rw.bucket, cw.bucket) AS bucket,
           |         ${bitlen3("wr")} - ${bitlen3("wc")} AS w
           |       FROM rw FULL JOIN cw ON rw.bucket = cw.bucket),
           |dc AS (SELECT doc_id, bucket, cast(count(*) AS BIGINT) AS cnt
           |       FROM dt GROUP BY 1, 2),
           |sc AS (SELECT doc_id, cast(sum(cnt * w) AS BIGINT) AS score_raw
           |       FROM dc JOIN wt USING (bucket) GROUP BY doc_id),
           |pr AS (SELECT doc_id, score_raw,
           |    cast(least(greatest(score_raw, 0) * 1000000 // $cap, 1000000)
           |         AS BIGINT) AS p_ppm
           |  FROM sc)
           |SELECT doc_id, score_raw, p_ppm,
           |  ${Sampling.rowHashSql("doc_id", "dsirlog")} % 1000000 < p_ppm AS keep
           |FROM pr""".stripMargin
      }),

    // ── edit-distance near-dup verify (blocked Levenshtein) ────────────
    // The verify stage fuzzy string dedup runs on SHORT fields (titles,
    // URLs, headings) where token-set measures are too coarse:
    // candidates block on prefix equality (a pure equi-join — blocking
    // IS the scale lever; Levenshtein is O(len²) per pair and must
    // never see the full cross product), then exact unit-cost edit
    // distance confirms dist ≤ 8 on the 48-char head. Both engines
    // compute classic Levenshtein. The fixture yields a natural
    // 28-candidate / 25-verified set — no injection needed.
    "q188_edit_distance_verify" -> Q(
      // Two-block union (prefix-16 OR suffix-16 of the 48-char window):
      // a prefix-only block silently drops any pair whose edit lands in
      // the first 16 characters — exactly the common "typo in the first
      // word" case. See TextAnalysis.editDistancePairs for the recall
      // contract; the oracle replays the same two blocks.
      (s, dir) => TextAnalysis.editDistancePairs(
        Tables.documents(s, dir), window = 48, blockLen = 16, maxDist = 8),
      """WITH p AS (SELECT doc_id, substr(text, 1, 48) AS t
        |  FROM documents),
        |blk AS (SELECT 'P|' || substr(t, 1, 16) AS blk, doc_id, t FROM p
        |        UNION ALL
        |        SELECT 'S|' || substr(t, greatest(length(t) - 15, 1), 16),
        |               doc_id, t FROM p),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |                a.t AS ta, b.t AS tb
        |         FROM blk a JOIN blk b ON a.blk = b.blk
        |         WHERE a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, cast(levenshtein(ta, tb) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(ta, tb) <= 8""".stripMargin),

    // ── byte-exact substring dedup (Lee et al. suffix-grouping shape) ──
    // The last capability descope of the span family closed: maximal
    // CROSS-DOCUMENT byte-exact matches ≥ 40 chars via the distributed
    // anchor-group-extend pass (every position's 40-char window hashes,
    // hash equi-join, left-maximal filter, CommonPrefixChars
    // extension). The fixture generator reuses sentences, so the match
    // relation is real data, not injection (25–259 maximal matches at
    // sf0.01–0.1, spans up to ~570 chars). The oracle replays the
    // identical pass on raw substrings — no hash in the oracle, so the
    // engine's collision-kill (match_len >= L) is itself verified.
    "q196_exact_substring" -> Q(
      (s, dir) => TextAnalysis.exactSubstringPairs(
        Tables.documents(s, dir), minLen = 40),
      TextAnalysis.exactSubstringOracleSql(minLen = 40)),

    // q196's SUB-LINEAR tier: winnowed fingerprints (rightmost-min of
    // each 21-hash window, selected entirely in-row) replace the
    // one-anchor-per-character relation in the self-join — an ~11×
    // shuffle/candidate reduction with a PROVEN recall floor. The
    // oracle is q196's VERBATIM (the winnowing guarantee: every maximal
    // match >= w+k-1 = 40 chars is found, and extension verifies bytes
    // so collisions add nothing) — the driver gate itself is the proof
    // that sampling lost no match above the guarantee.
    "q197_winnow_substring" -> Q(
      (s, dir) => TextAnalysis.winnowedSubstringPairs(
        Tables.documents(s, dir), k = 20, w = 21),
      TextAnalysis.exactSubstringOracleSql(minLen = 40)),

    // q197 with the HOT-ANCHOR CAP armed (round-12): fingerprint groups
    // larger than maxAnchorDf rows emit a star around the group
    // representative instead of the clique — the guard that keeps the
    // pair volume group-LINEAR when a passage is duplicated across ~10⁶
    // documents (the q31 stop-shingle discipline on the anchor join).
    // On the organic corpus no anchor group approaches the cap (top
    // passage df is single digits at every SF), so the capped plan must
    // produce EXACTLY the uncapped relation — the oracle is q196/q197's
    // verbatim, and the driver gate proves the cap's no-op contract on
    // real data. The planted mega-boilerplate behavior (bounded volume,
    // release-semantics preservation) is spec-pinned in TextAnalysisSpec.
    "q213_substring_anchor_cap" -> Q(
      (s, dir) => TextAnalysis.winnowedSubstringPairs(
        Tables.documents(s, dir), k = 20, w = 21, maxAnchorDf = 128),
      TextAnalysis.exactSubstringOracleSql(minLen = 40)),

    // ── CONTINUOUSLY-MAINTAINED release decision log (round-12) ────────
    // q212's "why did my document vanish" relation derived from the
    // maintainRelease stores instead of a one-shot chain: the corpus is
    // delivered as three id-ordered micro-batches through the stream's
    // verbatim batch body (frozen router weights, per-batch gates, hash
    // log, substring index + pair log), then readReleaseDecisions folds
    // the stores — id-sized folds + match-sized coverage/cut, no gate
    // or winnow re-run. The oracle is q212's VERBATIM, so the driver
    // hash gate proves continuous == one-shot over the settled corpus.
    // Session-cached pricing (the q205 contract): pass 1 builds the
    // stores and verifies the full derivation; later reads price the
    // ops-relation fold a deployment actually pays.
    "q214_release_decisions_maintained" -> Q(
      (s, dir) => {
        val store = graft.util.SessionStore.getOrBuild(
          s"relmaint|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
          "relmaint") { p =>
          val docs = Tables.documents(s, dir)
          TextAnalysis.langIdWeights(docs).write.parquet(s"$p/weights")
          val (lo, hi) = docs
            .agg(org.apache.spark.sql.functions.min(col("doc_id")),
              org.apache.spark.sql.functions.max(col("doc_id")))
            .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
            .head()
          val c1 = lo + (hi - lo) / 3
          val c2 = lo + 2 * (hi - lo) / 3
          val slices = Seq(
            col("doc_id") <= c1,
            col("doc_id") > c1 && col("doc_id") <= c2,
            col("doc_id") > c2)
          slices.zipWithIndex.foreach { case (pred, bid) =>
            graft.streaming.StreamIngest.releaseBatch(
              docs.where(pred), s"$p/store", s"$p/weights", bid.toLong,
              minLen = 40, k = 20)
          }
          // production posture: maintenance ON — the decision-log read
          // prices the keeper-grain folded hash log (the driver gate
          // then proves the fold path, not just the delta path)
          graft.streaming.StreamIngest.compactReleaseStores(
            s, s"$p/store", 2L, 8)
        }
        graft.streaming.StreamIngest.readReleaseDecisions(
          s, s"$store/store", totalBudget = 6000L)
      },
      releaseDecisionsOracleSql),

    // the REMOVAL half of exact-substring dedup (Lee et al.'s actual
    // edit): every maximal cross-doc match >= 40 chars cuts its span
    // from the pair's LATER document, spans union per doc, kept
    // segments reassemble. One row per affected doc with the full
    // cleaned text — the oracle replays pass -> islands -> string_agg,
    // so the driver hash-verifies the reassembled bytes themselves.
    // Runs on the winnowed tier; the oracle is exact-pass-based, so
    // this gate also re-proves q197's recall floor end-to-end.
    "q198_substring_cut" -> Q(
      (s, dir) => TextAnalysis.exactSubstringCut(
        Tables.documents(s, dir), minLen = 40),
      TextAnalysis.exactSubstringCutOracleSql(minLen = 40)),

    // the GRADED score between containment and equality: per candidate
    // pair, the ppm of the later doc's characters covered by maximal
    // shared spans >= 40 — what a dedup policy thresholds on when
    // whole-doc dropping is too blunt and span cutting too surgical.
    // Exact-integer ppm (the novelty_ppm discipline); per-pair interval
    // union shares the q198 merge fold.
    "q200_substring_coverage" -> Q(
      (s, dir) => TextAnalysis.substringCoverage(
        Tables.documents(s, dir), minLen = 40),
      TextAnalysis.substringCoverageOracleSql(minLen = 40)),

    // the DECISION layer: per document, its strongest coverage against
    // any earlier partner routes it to drop / cut / keep — the routing
    // a release pipeline executes before q198 does the cutting.
    // Exact-integer ppm thresholds; oracle composes the q200 CTE.
    "q201_substring_policy" -> Q(
      (s, dir) => TextAnalysis.substringPolicy(
        Tables.documents(s, dir), minLen = 40),
      TextAnalysis.substringPolicyOracleSql(minLen = 40)),

    // the EXECUTED release edit: q201's routing applied — drops vanish,
    // cuts carry q198's cleaned text, keeps pass through verbatim.
    // Output is the full post-edit corpus; oracle composes the policy
    // and cut CTEs exactly like the Spark plan.
    "q202_substring_release" -> Q(
      (s, dir) => TextAnalysis.substringRelease(
        Tables.documents(s, dir), minLen = 40),
      TextAnalysis.substringReleaseOracleSql(minLen = 40)),

    // train→eval contamination at byte resolution: for every val/test
    // document (deterministic q51 hash splits computed inline), the
    // exact characters shared in maximal spans >= 40 with any train
    // document — what still leaks through the n-gram split guard
    // (q135). Affected-only output; winnowed pair pass.
    "q203_substring_leak" -> Q(
      (s, dir) => TextAnalysis.substringLeak(
        Tables.documents(s, dir), minLen = 40),
      TextAnalysis.substringLeakOracleSql(minLen = 40)),

    // per-source quality-distribution drift vs the corpus: dense
    // stopword-ppm decile histograms + total-variation distance in
    // exact-integer ppm (no engine-divergent ln) — the monitoring
    // report a pipeline runs when a new crawl snapshot lands.
    "q204_quality_drift" -> Q(
      (s, dir) => TextAnalysis.qualityDrift(Tables.documents(s, dir)),
      TextAnalysis.qualityDriftOracleSql),

    // ── INCREMENTAL substring dedup: probe a batch vs the persisted
    // fingerprint index ──────────────────────────────────────────────
    // q196/q197 price the full corpus pass; a deployment ingesting
    // batches must not recompute corpus fingerprints per batch. The
    // settled corpus's winnowed index is a session artifact (q191's
    // pricing contract — pass 1 pays and verifies the build); the
    // registered plan winnows ONLY the batch and equi-joins the index
    // parquet. The oracle is the exact pass over the WHOLE corpus
    // filtered to cross-split pairs, so the driver proves the probe
    // loses nothing vs a full recompute.
    "q205_substring_indexed" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val corpus = docs.where(col("doc_id") % 7 =!= 3)
        val store = graft.util.SessionStore.getOrBuild(
          s"subidx|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
          "subidx") { p =>
          TextAnalysis.saveSubstringIndex(corpus, s"$p/fp", minLen = 40)
        }
        TextAnalysis.substringPairsAgainstIndex(
          docs.where(col("doc_id") % 7 === 3), corpus, s"$store/fp",
          minLen = 40)
      },
      s"WITH pass AS (${TextAnalysis.exactSubstringOracleSql(40)})\n" +
        """SELECT doc_a, doc_b, pos_a, pos_b, match_len FROM pass
          |WHERE (doc_a % 7 = 3) <> (doc_b % 7 = 3)""".stripMargin),

    // ── corpus-wide boilerplate report: top duplicated passages ────────
    // The rollup face of the substring family: which exact 40-char
    // windows recur across the most documents (licence headers, nav
    // chrome). Engine runs the lossless two-phase form (hashes shuffle,
    // text re-groups only the duplicated subset — a hash group always
    // ≥ its text groups, so the pre-filter drops nothing); the oracle
    // is the direct group-every-window-by-text form — hash equality
    // proves the phases collapse to the same table.
    "q211_top_passages" -> Q(
      (s, dir) => TextAnalysis.topDuplicatedPassages(
        Tables.documents(s, dir), len = 40, minDocs = 2, k = 20),
      TextAnalysis.topDuplicatedPassagesOracleSql(len = 40, minDocs = 2, k = 20)),

    // ── winnow-floor decision data: match-length distribution ──────────
    // q197's recall contract is complete for matches >= w+k-1 = 40
    // chars; this report measures what that floor actually costs on
    // the organic corpus — per source, matches and character mass in
    // [k, 40) (exact-pass-only territory) vs >= 40 (guaranteed by the
    // winnowed tier). minLen = k = 20, so the unmeasured residue is
    // exactly the sub-k-gram scrap no tier of the family can see.
    // Companion: the ScaleProbe winnow_kw sweep prices smaller (k, w).
    "q207_match_length_profile" -> Q(
      (s, dir) => TextAnalysis.matchLengthProfile(
        Tables.documents(s, dir), minLen = 20, floorLen = 40),
      TextAnalysis.matchLengthProfileOracleSql(minLen = 20, floorLen = 40)),

    // ── clean pipeline gated by the TRAINED router ─────────────────────
    // q74's cleaning chain with the language gate swapped from the
    // marker-word heuristic to the q178 TRAINED router — the
    // "downstream consumer" wiring that makes a better router matter.
    // Scope is the router's holdout (odd doc_ids — predictions on
    // training rows would flatter the gate); a doc passes iff the
    // trained prediction matches its label AND the q74 length /
    // repetition gates hold. Oracle composes the q178 CTE chain with
    // the q74 predicates.
    "q189_clean_trained" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val langOk = TextAnalysis.trainedLangId(docs)
          .where(col("is_match")).select("doc_id")
        val longEnough = TextAnalysis.qualityScore(docs)
          .where(col("n_tokens") >= 25).select("doc_id")
        val lowRep = TextAnalysis.repetitionScore(docs, n = 2)
          .where(col("rep_ratio") < 0.05).select("doc_id")
        docs.join(langOk, Seq("doc_id"), "left_semi")
          .join(longEnough, Seq("doc_id"), "left_semi")
          .join(lowRep, Seq("doc_id"), "left_semi")
          .select("doc_id", "lang")
      },
      s"""WITH $trainedLangCtes,
         |lok AS (SELECT doc_id FROM pred WHERE lang = lang_pred),
         |longok AS (SELECT doc_id FROM documents
         |           WHERE len(string_split(text, ' ')) >= 25),
         |reps AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS rep_ratio FROM
         |  (SELECT doc_id, g, count(*) AS c FROM
         |    (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
         |     FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
         |           FROM (SELECT doc_id, string_split(text, ' ') AS t
         |                 FROM documents) WHERE len(t) >= 2))
         |   GROUP BY 1, 2) GROUP BY doc_id),
         |repok AS (SELECT doc_id FROM reps WHERE rep_ratio < 0.05)
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id IN (SELECT doc_id FROM lok)
         |  AND doc_id IN (SELECT doc_id FROM longok)
         |  AND doc_id IN (SELECT doc_id FROM repok)""".stripMargin),

    // ── the RELEASE PIPELINE capstone (trained gate → dedup → mix →
    //    shards → manifest) ──────────────────────────────────────────────
    // The terminal composition of the round-9 surface: documents pass
    // the TRAINED-router cleaning gate (q189's chain), exact first-wins
    // dedup (q30), α=1/2 temperature mixing to a token budget (q157),
    // the deterministic shard layout (q124), and emit the per-shard
    // integrity MANIFEST (q165's arithmetic) — the |shards|-row
    // artifact a training run validates before reading. Every stage is
    // its already-verified fragment; ONE oracle replays raw documents →
    // manifest end-to-end, so the driver hash-verifies the whole
    // release path in a single gate. No new exchange classes.
    "q190_release_pipeline" -> Q(
      (s, dir) => {
        // gate+dedup ride the session RELEASE SPINE (round-12: one
        // fingerprint-keyed materialization shared with q206/q212 —
        // pass 1 builds and verifies the whole derivation, siblings
        // price at delta cost; parity with the inline chain is
        // spec-pinned in ReleaseSpineSpec). The spine's parquet IS the
        // gate-boundary materialization the q206 lesson demanded.
        val spine = graft.ext.ReleaseSpine.store(s, dir)
        val deduped = s.read.parquet(s"$spine/deduped")
          .select(col("doc_id"), col("lang"), col("text"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
        val mixed = Sampling.sampleToTemperature(deduped, "doc_id", "lang",
          "n_tokens", totalBudget = 6000L)
        graft.streaming.StreamIngest.manifestOf(
          Sampling.shuffleShards(
            mixed.select(col("doc_id"), col("text")), "doc_id", nShards = 4))
      },
      {
        val dedSql = "SELECT doc_id, lang, n_tokens FROM ded"
        s"""WITH $trainedLangCtes,
           |lok AS (SELECT doc_id FROM pred WHERE lang = lang_pred),
           |longok AS (SELECT doc_id FROM documents
           |           WHERE len(string_split(text, ' ')) >= 25),
           |rrep AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS rep_ratio FROM
           |  (SELECT doc_id, g, count(*) AS c FROM
           |    (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
           |     FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
           |           FROM (SELECT doc_id, string_split(text, ' ') AS t
           |                 FROM documents) WHERE len(t) >= 2))
           |   GROUP BY 1, 2) GROUP BY doc_id),
           |repok AS (SELECT doc_id FROM rrep WHERE rep_ratio < 0.05),
           |clean AS (SELECT doc_id, lang, text FROM documents
           |  WHERE doc_id IN (SELECT doc_id FROM lok)
           |    AND doc_id IN (SELECT doc_id FROM longok)
           |    AND doc_id IN (SELECT doc_id FROM repok)),
           |keep AS (SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(text)),
           |ded AS (SELECT c.doc_id, c.lang, c.text,
           |    cast(len(string_split(c.text, ' ')) AS BIGINT) AS n_tokens
           |  FROM clean c JOIN keep USING (doc_id)),
           |${Sampling.temperatureBudgetCtes(dedSql, "lang", "n_tokens", 6000L)},
           |tmixed AS (SELECT doc_id, lang, text, n_tokens,
           |    ${Sampling.cumTokensSql("doc_id", "lang", "n_tokens", "temp")} AS cum
           |  FROM ded),
           |mx AS (SELECT m.doc_id, m.text FROM tmixed m
           |       JOIN tbudget b ON m.lang = b.domain WHERE m.cum <= b.b),
           |shd AS (SELECT doc_id, text,
           |    cast(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
           |    ${Sampling.rowHashSql("doc_id", "shard")} % 4 AS shard,
           |    ${sqlHash64("cast(doc_id AS VARCHAR) || ':' || text")} AS h
           |  FROM mx)
           |SELECT shard, cast(count(*) AS BIGINT) AS n_docs,
           |  cast(sum(n_toks) AS BIGINT) AS n_tokens,
           |  cast(bit_xor(h) AS BIGINT) AS checksum
           |FROM shd GROUP BY shard""".stripMargin
      }),

    // ── release capstone WITH the byte-exact substring tier ────────────
    // q190 extended by the round-10 headline: between exact dedup and
    // temperature mixing, the corpus routes through the substring
    // POLICY EDIT (q201/q202's drop/cut/keep — mostly-lifted documents
    // vanish, partially-lifted documents lose exactly their duplicated
    // spans, the clean majority passes through verbatim), and the mix /
    // shards / manifest all price the EDITED text. This makes the
    // substring tier a verified stage of the terminal release path
    // instead of a side report. ONE oracle replays raw documents →
    // manifest, composing q190's gate/dedup CTEs with the
    // source-parameterized substring-release chain (src = the
    // post-dedup CTE — the round-11 parameterization). Scale shape: no
    // new exchange classes beyond q190 + q202; the winnowed pair pass
    // (the only corpus-sized work of the new stage) runs once,
    // localCheckpoint'd, on the post-gate post-dedup corpus.
    "q206_release_substring" -> Q(
      (s, dir) => {
        // gate → dedup → substring edit ride the session RELEASE SPINE
        // (round-12): the chain that was referenced four times
        // downstream — and then recomputed again by q212's decision log
        // and priced a third time in q190 — is materialized ONCE per
        // (fixture, session) behind a fingerprint-keyed store. Pass 1
        // builds and verifies the whole derivation (fresh driver
        // session = full chain); siblings read parquet. Parity with
        // the inline chain is spec-pinned in ReleaseSpineSpec.
        val spine = graft.ext.ReleaseSpine.store(s, dir)
        val deduped = s.read.parquet(s"$spine/deduped")
        val edited = s.read.parquet(s"$spine/edited")
        val mixIn = edited
          .join(deduped.select("doc_id", "lang"), Seq("doc_id"))
          .select(col("doc_id"), col("lang"),
            col("final_text").as("text"),
            size(split(col("final_text"), " ")).cast("long").as("n_tokens"))
        val mixed = Sampling.sampleToTemperature(mixIn, "doc_id", "lang",
          "n_tokens", totalBudget = 6000L)
        graft.streaming.StreamIngest.manifestOf(
          Sampling.shuffleShards(
            mixed.select(col("doc_id"), col("text")), "doc_id", nShards = 4))
      },
      {
        val redSql = "SELECT doc_id, lang, n_tokens FROM red"
        // the substring-release SQL contains lines starting with `||`
        // (the cut reassembly) — it is concatenated OUTSIDE the
        // stripMargin blocks, never embedded in one (the q202 rule)
        val head = s"""WITH $trainedLangCtes,
           |lok AS (SELECT doc_id FROM pred WHERE lang = lang_pred),
           |longok AS (SELECT doc_id FROM documents
           |           WHERE len(string_split(text, ' ')) >= 25),
           |rrep AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS rep_ratio FROM
           |  (SELECT doc_id, g, count(*) AS c FROM
           |    (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
           |     FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
           |           FROM (SELECT doc_id, string_split(text, ' ') AS t
           |                 FROM documents) WHERE len(t) >= 2))
           |   GROUP BY 1, 2) GROUP BY doc_id),
           |repok AS (SELECT doc_id FROM rrep WHERE rep_ratio < 0.05),
           |clean AS (SELECT doc_id, lang, text FROM documents
           |  WHERE doc_id IN (SELECT doc_id FROM lok)
           |    AND doc_id IN (SELECT doc_id FROM longok)
           |    AND doc_id IN (SELECT doc_id FROM repok)),
           |keep AS (SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(text)),
           |ded AS (SELECT c.doc_id, c.lang, c.text
           |        FROM clean c JOIN keep USING (doc_id))""".stripMargin
        val tail = s"""red AS (SELECT r.doc_id, d.lang, r.final_text AS text,
           |    cast(len(string_split(r.final_text, ' ')) AS BIGINT) AS n_tokens
           |  FROM rel r JOIN ded d USING (doc_id)),
           |${Sampling.temperatureBudgetCtes(redSql, "lang", "n_tokens", 6000L)},
           |tmixed AS (SELECT doc_id, lang, text, n_tokens,
           |    ${Sampling.cumTokensSql("doc_id", "lang", "n_tokens", "temp")} AS cum
           |  FROM red),
           |mx AS (SELECT m.doc_id, m.text FROM tmixed m
           |       JOIN tbudget b ON m.lang = b.domain WHERE m.cum <= b.b),
           |shd AS (SELECT doc_id, text,
           |    cast(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
           |    ${Sampling.rowHashSql("doc_id", "shard")} % 4 AS shard,
           |    ${sqlHash64("cast(doc_id AS VARCHAR) || ':' || text")} AS h
           |  FROM mx)
           |SELECT shard, cast(count(*) AS BIGINT) AS n_docs,
           |  cast(sum(n_toks) AS BIGINT) AS n_tokens,
           |  cast(bit_xor(h) AS BIGINT) AS checksum
           |FROM shd GROUP BY shard""".stripMargin
        head + ",\nrel AS (" +
          TextAnalysis.substringReleaseOracleSql(40, src = "ded") + "),\n" + tail
      }),

    // ── the release DECISION LOG: why did my document vanish ───────────
    // Per-document terminal fate through q206's chain with
    // first-reason-wins attribution — the debug relation an ops
    // engineer joins when a source asks where its documents went:
    // gate_lang → gate_len → gate_rep → dedup_exact → substring_drop
    // → mix_budget → kept, evaluated in PIPELINE order (a document
    // failing two gates reports the FIRST, matching what the pipeline
    // actually did — the q142 funnel's exclusive-attribution law at
    // per-document grain). Every stage relation is q206's verbatim;
    // the oracle replays the same CTE chain and CASE order, so the
    // driver proves the attribution against the composed pipeline
    // itself. Scale shape: six id-sized left joins onto the corpus
    // spine — no new exchange classes.
    "q212_release_decisions" -> Q(
      (s, dir) => {
        def flag(ids: org.apache.spark.sql.DataFrame, name: String) =
          ids.select(col("doc_id"), lit(true).as(name))
        // every stage relation rides the session RELEASE SPINE
        // (round-12): gates/deduped/edited are the materialized
        // q206-verbatim chain, so this query prices at exactly what the
        // verdict asked for — six id-sized joins over a cached spine
        // (plus the id-sized mix replay, which is budget-parameterized
        // and stays out of the spine). First-reason-wins attribution
        // and the oracle are unchanged.
        val spine = graft.ext.ReleaseSpine.store(s, dir)
        val gates = s.read.parquet(s"$spine/gates")
        val deduped = s.read.parquet(s"$spine/deduped")
        val edited = s.read.parquet(s"$spine/edited")
        // substring drops are the COMPLEMENT of the release output —
        // never a second substringPolicy recompute
        val dropped = deduped.select("doc_id")
          .join(edited.select("doc_id"), Seq("doc_id"), "left_anti")
        val mixIn = edited
          .join(deduped.select("doc_id", "lang"), Seq("doc_id"))
          .select(col("doc_id"), col("lang"),
            size(split(col("final_text"), " ")).cast("long").as("n_tokens"))
        val mixed = Sampling.sampleToTemperature(mixIn, "doc_id", "lang",
          "n_tokens", totalBudget = 6000L).select("doc_id")
        gates
          .join(flag(deduped.select("doc_id"), "f_ded"), Seq("doc_id"), "left")
          .join(flag(dropped, "f_drop"), Seq("doc_id"), "left")
          .join(flag(mixed, "f_mix"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(!col("f_lang"), lit("gate_lang"))
              .when(!col("f_len"), lit("gate_len"))
              .when(!col("f_rep"), lit("gate_rep"))
              .when(col("f_ded").isNull, lit("dedup_exact"))
              .when(col("f_drop").isNotNull, lit("substring_drop"))
              .when(col("f_mix").isNull, lit("mix_budget"))
              .otherwise(lit("kept")).as("fate"))
      },
      releaseDecisionsOracleSql),

    // ── CONTINUOUSLY-MAINTAINED boilerplate report (round-12) ──────────
    // q211's corpus-wide top-duplicated-passages table derived from a
    // maintainSubstringIndex store instead of a corpus re-scan: the
    // corpus is delivered as three id-ordered batches through the
    // stream's verbatim batch body (per-batch winnow, append-only
    // fp/texts/pairs), then readTopPassages folds the INDEX — hash
    // grain, the winnow-losslessness candidate argument, exact rollup
    // restricted to candidate documents. The oracle is q211's VERBATIM
    // one-shot rollup, so the driver hash gate proves the maintained
    // store loses no passage (previously a spec-only law). Shares the
    // session store with q217 (one build, two maintained reads).
    "q216_top_passages_maintained" -> Q(
      (s, dir) => StreamIngest.readTopPassages(
        s, s"${winnowStore(s, dir)}/store", len = 40, minDocs = 2, k = 20),
      TextAnalysis.topDuplicatedPassagesOracleSql(len = 40, minDocs = 2,
        k = 20)),

    // ── the maintained CROSS-BATCH pair log, driver-proven ─────────────
    // maintainSubstringIndex's pairs sidecar accumulates exactly the
    // winnowed pair relation over the delivered union RESTRICTED TO
    // CROSS-BATCH pairs (within-batch duplication is the batch's own
    // q197 pass — the spec'd decomposition). The oracle states that
    // law in SQL: the exact full-corpus pass filtered to pairs whose
    // docs landed in different id-third slices — the same slicing the
    // in-query build delivers — so the driver hash gate proves the
    // incremental probe loses nothing vs the full recompute at every
    // SF (q205's discipline, now for the STREAMED store).
    "q217_substring_stream_pairs" -> Q(
      (s, dir) => StreamIngest.readSubstringPairs(
          s, s"${winnowStore(s, dir)}/store")
        .select(col("doc_a"), col("doc_b"), col("pos_a"), col("pos_b"),
          col("match_len")),
      s"WITH pass AS (${TextAnalysis.exactSubstringOracleSql(40)}),\n" +
        """b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
          |sl AS (SELECT doc_id,
          |    CASE WHEN doc_id <= lo + (hi - lo) // 3 THEN 0
          |         WHEN doc_id <= lo + (2 * (hi - lo)) // 3 THEN 1
          |         ELSE 2 END AS slice
          |  FROM documents, b)
          |SELECT p.doc_a, p.doc_b, p.pos_a, p.pos_b, p.match_len
          |FROM pass p
          |JOIN sl sa ON p.doc_a = sa.doc_id
          |JOIN sl sb ON p.doc_b = sb.doc_id
          |WHERE sa.slice <> sb.slice""".stripMargin),

    // ── IVFPQ recall calibration (round-12): the persisted-probe path ──
    // q164 pins IVF recall; this extends the gate to the IVFPQ
    // persisted-index probe (q101/q105's path) at its registered
    // operating point (nprobe=2, shortlist=32): recall@5 of
    // ivfpqTopKFromIndex vs bruteForceTopK, per query, exact-integer
    // ppm. The oracle replays the SAME ivfpq CTE chain q101 verifies
    // (one shared arithmetic — KMeans.ivfpqRankedCtes) plus the
    // brute-force ranking and the recall join, so the driver hash gate
    // proves both the probe ranking AND the calibration number.
    "q215_ann_ivfpq_recall" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.recallReport(
          Similarity.ivfpqTopKFromIndex(
            Similarity.sessionIvfpqIndex(emb, dir, dim = 64, nCoarse = 8,
              m = 4, kSub = 16, iters = 1),
            emb, dim = 64, nQueries = 8, k = 5, m = 4,
            nprobe = 2, shortlist = 32),
          Similarity.bruteForceTopK(emb, nQueries = 8, k = 5), k = 5)
      },
      KMeans.ivfpqRecallOracleSql(dim = 64, nCoarse = 8, nQueries = 8,
        topK = 5, m = 4, kSub = 16, iters = 1, nprobe = 2, shortlist = 32)),

    // ── IVFPQ recall-vs-nprobe SWEEP (round-13): the knob, measured ────
    // q215 pins recall at the registered operating point (nprobe=2,
    // shortlist=32), where BOTH approximations bind at once; this query
    // isolates the nprobe axis so a reader sees the knob WORKING: the
    // same persisted-index probe at nprobe ∈ {2, 4, 8} in EXACT-RERANK
    // ceiling mode (shortlist larger than any probed candidate set, so
    // every candidate is exact-cosine reranked and recall is PURELY
    // probe coverage). The curve is guaranteed to end at 1.0: nprobe=8
    // probes all nCoarse buckets, making the arm brute force by
    // construction — measured at sf0.01 as 0.90 → 0.93 → 1.00 mean
    // (at sf0.1 the truth already lives in the 2 nearest buckets for
    // all 8 queries, so the whole curve sits at 1.0 — data-dependent,
    // and the oracle proves whatever the fixture yields).
    // (At shortlist=32 the curve plateaus at the ADC artifact level
    // instead — that composite point is exactly what q215 pins.)
    // One session index serves all three arms (q175's shared-assignment
    // discipline — the sweep prices three probes, not three trainings);
    // the brute-force truth is computed once and checkpointed (40
    // rows). Ceiling-mode cost is the calibration price: candidates ×
    // nQueries rerank rows, the q35 brute-force class — a measurement
    // run, not a serving path. The oracle replays the full shared
    // ivfpqRankedCtes arithmetic once per width as independent
    // WITH-subqueries, so the driver hash gate proves every point on
    // the curve, not just the operating one.
    "q218_ann_ivfpq_recall_sweep" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val idx = Similarity.sessionIvfpqIndex(emb, dir, dim = 64,
          nCoarse = 8, m = 4, kSub = 16, iters = 1)
        val truth = Similarity.bruteForceTopK(emb, nQueries = 8, k = 5)
          .localCheckpoint(true) // 40 rows, consumed by all three arms
        Seq(2, 4, 8).map { np =>
          Similarity.recallReport(
            Similarity.ivfpqTopKFromIndex(idx, emb, dim = 64, nQueries = 8,
              k = 5, m = 4, nprobe = np, shortlist = 1 << 20),
            truth, k = 5)
            .select(lit(np.toLong).as("nprobe"), col("q_id"), col("hits"),
              col("recall_ppm"))
        }.reduce(_ unionByName _)
      },
      Seq(2, 4, 8).map { np =>
        s"SELECT CAST($np AS BIGINT) AS nprobe, q_id, hits, recall_ppm FROM (\n" +
          KMeans.ivfpqRecallOracleSql(dim = 64, nCoarse = 8, nQueries = 8,
            topK = 5, m = 4, kSub = 16, iters = 1, nprobe = np,
            shortlist = 1 << 20) + "\n)"
      }.mkString("\nUNION ALL\n")),

    // ── INCREMENTAL ANN index maintenance, driver-proven (round-13) ────
    // The FAISS train/add contract as an oracle row: codebooks train
    // ONCE on the settled corpus (vec_id ≤ 4/5 of max — the deployed
    // index), the remaining fifth arrives later and is ADDED with the
    // codebooks FROZEN (Similarity.ivfpqIndexAdd — coarse-assign,
    // residual-encode, PQ-code, append to the bucket-partitioned codes;
    // no retrain, no rewrite of settled codes), and the standard probe
    // then searches the union. The oracle replays exactly that:
    // fit chains restricted to the settled rows, assignment CTEs over
    // ALL rows, then the verbatim probe/ADC/shortlist/rerank chain —
    // so the driver hash gate proves train-then-add == one coherent
    // index over the union (previously a spec-only law in
    // StreamExtSpec's continuous-ANN-ingest test). Session-cached
    // build (the q205 pricing discipline): pass 1 builds + adds.
    "q219_ann_ivfpq_index_add" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val idx = graft.util.SessionStore.getOrBuild(
          s"ivfadd|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
          "ivfadd") { p =>
          val cut = emb.agg(org.apache.spark.sql.functions.max(col("vec_id")))
            .head().getLong(0) * 4 / 5
          Similarity.buildIvfpqIndex(emb.where(col("vec_id") <= cut),
            dim = 64, nCoarse = 8, m = 4, kSub = 16, iters = 1,
            path = s"$p/idx")
          Similarity.ivfpqIndexAdd(s"$p/idx", emb.where(col("vec_id") > cut),
            dim = 64, m = 4)
        }
        Similarity.ivfpqTopKFromIndex(s"$idx/idx", emb, dim = 64,
          nQueries = 8, k = 5, m = 4, nprobe = 2, shortlist = 32)
      },
      KMeans.ivfpqIncrementalOracleSql(dim = 64, nCoarse = 8, nQueries = 8,
        topK = 5, m = 4, kSub = 16, iters = 1, nprobe = 2, shortlist = 32,
        trainWhere =
          "vec_id <= (SELECT cast(max(vec_id) AS BIGINT) * 4 // 5 FROM embeddings)")),

    // ── STREAMED index adds, replay-guarded, driver-proven (round-13) ──
    // q219 proves ONE bulk add; this proves the CONTINUOUS path: the
    // tail arrives as two micro-batches through the replay-guarded
    // batch body (Similarity.ivfpqIndexAddBatch — the maintainAnnIndex
    // per-batch work), and the SECOND batch is deliberately REDELIVERED
    // inside the build. The oracle is q219's verbatim: codes under
    // frozen codebooks are per-vector arithmetic, so batch boundaries
    // don't matter — and a replay-guard failure would double the ADC
    // residual sums and hash-mismatch, so the driver gate itself proves
    // exactly-once, not just parity. Round-15: the build then TEARS one
    // vector (deletes a strict subset of its m code rows — the state a
    // mid-append crash leaves) and redelivers once more, so the same
    // verbatim oracle also proves the complete-code-set guard heals
    // torn appends on the bucketed family (q225 is the flat sibling).
    "q220_ann_index_add_stream" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val idx = graft.util.SessionStore.getOrBuild(
          s"ivfaddstr|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
          "ivfaddstr") { p =>
          val maxId = emb.agg(org.apache.spark.sql.functions.max(col("vec_id")))
            .head().getLong(0)
          val cut = maxId * 4 / 5
          val mid = cut + (maxId - cut) / 2
          Similarity.buildIvfpqIndex(emb.where(col("vec_id") <= cut),
            dim = 64, nCoarse = 8, m = 4, kSub = 16, iters = 1,
            path = s"$p/idx")
          Similarity.ivfpqIndexAddBatch(s"$p/idx",
            emb.where(col("vec_id") > cut && col("vec_id") <= mid),
            dim = 64, m = 4)
          Similarity.ivfpqIndexAddBatch(s"$p/idx",
            emb.where(col("vec_id") > mid), dim = 64, m = 4)
          // maintenance tick (round-15): the codes store rewrites at a
          // bounded file count through the crash-safe swap — rows and
          // bucket partitioning preserved, so the replay below must
          // still find its batch settled in the POST-REWRITE store and
          // the probe must prune/rank identically (hash-gated)
          Similarity.compactCodes(s, s"$p/idx", filesTarget = 4)
          // at-least-once: the last batch replays verbatim
          Similarity.ivfpqIndexAddBatch(s"$p/idx",
            emb.where(col("vec_id") > mid), dim = 64, m = 4)
          // torn append: the last-added vector keeps only subspaces
          // {0, 1}; the next redelivery must re-encode exactly it
          val codes = s.read.parquet(s"$p/idx/codes").localCheckpoint(true)
          codes.where(!(col("vec_id") === maxId && col("m") >= 2))
            .write.mode("overwrite").partitionBy("bucket")
            .parquet(s"$p/idx/codes")
          Similarity.ivfpqIndexAddBatch(s"$p/idx",
            emb.where(col("vec_id") > mid), dim = 64, m = 4): Unit
        }
        Similarity.ivfpqTopKFromIndex(s"$idx/idx", emb, dim = 64,
          nQueries = 8, k = 5, m = 4, nprobe = 2, shortlist = 32)
      },
      KMeans.ivfpqIncrementalOracleSql(dim = 64, nCoarse = 8, nQueries = 8,
        topK = 5, m = 4, kSub = 16, iters = 1, nprobe = 2, shortlist = 32,
        trainWhere =
          "vec_id <= (SELECT cast(max(vec_id) AS BIGINT) * 4 // 5 FROM embeddings)")),

    // ── flat-PQ incremental add, replay-guarded, driver-proven ─────────
    // The q219/q220 discipline on the FLAT index family: codebooks
    // train once on the settled four-fifths, the tail arrives through
    // the guarded add (Similarity.pqIndexAddBatch — frozen per-subspace
    // codebooks, settled-id anti-join) with the batch REDELIVERED
    // inside the build, and the probe scans the union. Oracle: the
    // pqOracleSql arithmetic with fit chains restricted to the settled
    // rows and codes over all rows — a guard failure doubles the ADC
    // sums and hash-mismatches, so the gate proves exactly-once.
    "q222_ann_pq_index_add" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val idx = graft.util.SessionStore.getOrBuild(
          s"pqadd|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
          "pqadd") { p =>
          val cut = emb.agg(org.apache.spark.sql.functions.max(col("vec_id")))
            .head().getLong(0) * 4 / 5
          Similarity.buildPqIndex(emb.where(col("vec_id") <= cut),
            dim = 64, m = 4, kSub = 16, iters = 1, path = s"$p/idx")
          Similarity.pqIndexAddBatch(s"$p/idx",
            emb.where(col("vec_id") > cut), dim = 64, m = 4)
          Similarity.pqIndexAddBatch(s"$p/idx",
            emb.where(col("vec_id") > cut), dim = 64, m = 4): Unit
        }
        Similarity.pqTopKFromIndex(s"$idx/idx", emb, dim = 64,
          nQueries = 8, k = 5, m = 4, shortlist = 64)
      },
      KMeans.pqIncrementalOracleSql(dim = 64, nQueries = 8, topK = 5,
        m = 4, kSub = 16, iters = 1, shortlist = 64,
        trainWhere =
          "vec_id <= (SELECT cast(max(vec_id) AS BIGINT) * 4 // 5 FROM embeddings)")),

    // ── upgrade-in-place completeness, driver-proven (round-15) ────────
    // The winnowStore build strips the counts sidecar and the meta
    // completeness flag after its second batch — the exact state a
    // pre-r15 store is in when new code takes over — so its final
    // batch exercises the backfill-then-flag path. This row reads the
    // upgraded store at a DIFFERENT report point than q216 (minDocs=3:
    // boilerplate spanning ≥3 documents), and the oracle is the
    // verbatim one-shot rollup: an incomplete backfill undercounts
    // every pre-upgrade document and hash-mismatches. Zero extra build
    // cost — the same session store serves q216/q217/q224.
    "q224_top_passages_upgraded" -> Q(
      (s, dir) => StreamIngest.readTopPassages(
        s, s"${winnowStore(s, dir)}/store", len = 40, minDocs = 3, k = 20),
      TextAnalysis.topDuplicatedPassagesOracleSql(len = 40, minDocs = 3,
        k = 20)),

    // ── torn-append repair, driver-proven (round-15) ───────────────────
    // q222 proves replay/redelivery exactly-once; this proves CRASH
    // TORN appends heal: after the guarded add lands the tail, the
    // build deletes a strict subset of one vector's m code rows (the
    // state a mid-append crash leaves) and redelivers the batch. The
    // complete-code-set guard must re-encode exactly the torn vector
    // and append only its missing rows — a presence-keyed guard leaves
    // it half-coded, ADC sums over fewer than m subspaces, and the
    // probe hash-mismatches the oracle (which codes every vector
    // whole). Oracle: q222's verbatim incremental arithmetic.
    "q225_ann_pq_torn_repair" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val idx = graft.util.SessionStore.getOrBuild(
          s"pqtorn|$dir|${graft.util.SessionStore.dirFingerprint(dir)}",
          "pqtorn") { p =>
          val maxId = emb.agg(org.apache.spark.sql.functions.max(col("vec_id")))
            .head().getLong(0)
          val cut = maxId * 4 / 5
          Similarity.buildPqIndex(emb.where(col("vec_id") <= cut),
            dim = 64, m = 4, kSub = 16, iters = 1, path = s"$p/idx")
          Similarity.pqIndexAddBatch(s"$p/idx",
            emb.where(col("vec_id") > cut), dim = 64, m = 4)
          // tear: the last-added vector keeps only subspaces {0, 1}
          val codes = s.read.parquet(s"$p/idx/codes").localCheckpoint(true)
          codes.where(!(col("vec_id") === maxId && col("m") >= 2))
            .write.mode("overwrite").parquet(s"$p/idx/codes")
          // redelivery repairs the torn vector, exactly-once
          Similarity.pqIndexAddBatch(s"$p/idx",
            emb.where(col("vec_id") > cut), dim = 64, m = 4): Unit
        }
        Similarity.pqTopKFromIndex(s"$idx/idx", emb, dim = 64,
          nQueries = 8, k = 5, m = 4, shortlist = 64)
      },
      KMeans.pqIncrementalOracleSql(dim = 64, nQueries = 8, topK = 5,
        m = 4, kSub = 16, iters = 1, shortlist = 64,
        trainWhere =
          "vec_id <= (SELECT cast(max(vec_id) AS BIGINT) * 4 // 5 FROM embeddings)")),

    // ── out-of-order arrival observability, driver-proven (round-16) ───
    // The release store's late sidecar counts each batch's later-
    // arriving smaller-id content twins whose first-arrived twin owns
    // the substring index (releaseBatch's append-only-greedy admission
    // caveat; the arrival shape of the reference crawl,
    // fetch_conversation_tweets.py:72-86). Spec-only until now because
    // the organic fixture has no exact duplicates at any gate SF — the
    // twin-injected corpus + REVERSED slice delivery make the count
    // non-empty at every SF, and the oracle re-derives it from first
    // principles: per batch, gate-passing batch keepers whose hash
    // settled earlier under a larger id.
    "q226_release_late_arrivals" -> Q(
      (s, dir) => graft.streaming.StreamIngest.readLateArrivals(
        s, s"${oooReleaseStore(s, dir)}/store"),
      s"""WITH $lateArrivalsCtes
         |SELECT batch_id, n_late_smaller_id FROM perb""".stripMargin),

    // ── late-arrival magnitude histogram (third consumer, round-17) ────
    // VERDICT r16 item 7: per-batch counts alone don't say whether
    // lateness is a trickle or a burst. Bucket the per-batch late
    // counts by binary digit count (exact log2, ≤ 64 buckets — the
    // q176 bounded-histogram discipline) with the late mass per
    // bucket. Reads the SAME sidecar through the SAME read-time
    // max-fold as q226 (and the same oracle CTE chain, so the two
    // consumers cannot drift) — a third registered consumer of the
    // oooReleaseStore session fixture, zero new stores.
    "q229_release_late_histogram" -> Q(
      (s, dir) => {
        val late = graft.streaming.StreamIngest.readLateArrivals(
          s, s"${oooReleaseStore(s, dir)}/store")
        late.select(
            length(org.apache.spark.sql.functions.expr(
              "conv(n_late_smaller_id, 10, 2)")).cast("long").as("bucket"),
            col("n_late_smaller_id"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_batches"),
            sum(col("n_late_smaller_id")).as("n_late_total"))
      },
      s"""WITH $lateArrivalsCtes
         |SELECT cast(length(bin(n_late_smaller_id)) AS BIGINT) AS bucket,
         |       cast(count(*) AS BIGINT) AS n_batches,
         |       cast(sum(n_late_smaller_id) AS BIGINT) AS n_late_total
         |FROM perb GROUP BY 1""".stripMargin),

    // ── per-batch late FRACTION (fourth consumer, round-18) ────────────
    // VERDICT r17 item 5: an absolute late count can't say whether a
    // batch was 1% or 100% divergent. Since r18 each late observation
    // carries its batch's keeper count (the denominator rides the tiny
    // late sidecar — no batch_id on the keeper-grain-compacted hashes
    // log, no store re-scan), so late/keepers folds straight from the
    // sidecar as exact integer ppm. The oracle extends the SAME CTE
    // chain q226/q229 verify with the per-batch keeper count derived
    // from first principles — a fourth registered consumer of the
    // oooReleaseStore session fixture, zero new stores.
    "q230_release_late_fraction" -> Q(
      (s, dir) => graft.streaming.StreamIngest.readLateFractions(
        s, s"${oooReleaseStore(s, dir)}/store"),
      s"""WITH $lateArrivalsCtes,
         |kc AS (SELECT batch_id, cast(count(*) AS BIGINT) AS n_batch_keepers
         |       FROM keepb GROUP BY batch_id)
         |SELECT p.batch_id, p.n_late_smaller_id, k.n_batch_keepers,
         |       cast(p.n_late_smaller_id * 1000000 // k.n_batch_keepers
         |            AS BIGINT) AS late_ppm
         |FROM perb p JOIN kc k ON p.batch_id = k.batch_id""".stripMargin),

    // ── the keeper min-fold is arrival-order-INDEPENDENT ───────────────
    // The exact-dedup keeper the release decisions trust is a read-time
    // min-fold of the hash log, so it must equal the one-shot global
    // keeper under ANY delivery order (the law StreamIngestSpec pins on
    // a 5-doc fixture, here driver-gated over the reversed-delivery
    // store at every SF — and through the compaction tick, which
    // pre-folds the log to keeper grain). Second consumer of the q226
    // store: the build amortizes across both rows.
    "q227_release_keepers_ooo" -> Q(
      (s, dir) => {
        val store = oooReleaseStore(s, dir)
        graft.ingest.Sinks.recoverCompact(s, s"$store/store/hashes")
        s.read.parquet(s"$store/store/hashes")
          .groupBy(col("h"))
          .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"), col("h"))
      },
      s"""WITH $twinInjectedSql,
         |${releaseCleanCtes("dtwin")}
         |SELECT cast(min(doc_id) AS BIGINT) AS doc_id, md5(text) AS h
         |FROM clean GROUP BY md5(text)""".stripMargin),

    // ── token-mass inequality across sources (Gini, exact ppm) ─────────
    // One number for "is this corpus dominated by a few feeds": the
    // Gini coefficient of per-source token mass via the rank formula
    // G = (2·Σ i·mᵢ − (n+1)·Σm) / (n·Σm) over sources sorted by
    // (mass, name) — all exact integers, truncating ppm. The rank
    // window runs over the |sources|-row rollup (metadata — single
    // partition is correct there, the q176 histogram discipline).
    "q186_token_gini" -> Q(
      (s, dir) => {
        val m = Tables.documents(s, dir).groupBy(col("source"))
          .agg(sum(size(split(col("text"), " ")).cast("long")).as("m"))
        val ranked = m.withColumn("i",
          org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("m"), col("source"))).cast("long"))
        // The rank-formula numerator is ~n·(Σm)·1e6 — at the 100 TB
        // target (Σm ≈ 1e13 tokens) that overflows Long, so the whole
        // numerator/denominator chain runs in DECIMAL(38,0) (HUGEINT on
        // the oracle side), the same widening as the temperature budgets.
        ranked.agg(count(lit(1)).as("n_sources"),
            sum(col("m")).as("total_tokens"),
            sum(col("i").cast("decimal(38,0)") * col("m")).as("_s"))
          .select(col("n_sources"), col("total_tokens"),
            org.apache.spark.sql.functions.expr(
              "cast((2 * _s - (cast(n_sources as decimal(38,0)) + 1) * total_tokens)" +
                " * 1000000 div (cast(n_sources as decimal(38,0)) * total_tokens)" +
                " as bigint)").as("gini_ppm"))
      },
      """WITH m AS (SELECT source,
        |    cast(sum(len(string_split(text, ' '))) AS BIGINT) AS m
        |  FROM documents GROUP BY source),
        |r AS (SELECT m, cast(row_number() OVER (ORDER BY m, source) AS BIGINT) AS i
        |      FROM m)
        |SELECT cast(count(*) AS BIGINT) AS n_sources,
        |  cast(sum(m) AS BIGINT) AS total_tokens,
        |  cast((2 * sum(cast(i AS HUGEINT) * m)
        |        - (count(*) + 1) * cast(sum(m) AS HUGEINT)) * 1000000
        |       // (count(*) * cast(sum(m) AS HUGEINT)) AS BIGINT) AS gini_ppm
        |FROM r""".stripMargin),
  )

  /** q130's paragraph-dedup oracle — brute-force all-pairs over the
    * chunk simhashes. Shared VERBATIM by q232 (the chunk-df-capped
    * form must produce exactly this relation on the organic corpus,
    * whose buckets never reach the cap — the q213 no-op-contract
    * pattern). */
  private lazy val paragraphDedupOracleSql: String = {
    val base = TextAnalysis.ChunkKeyBase
    s"""WITH ch AS (SELECT doc_id, cast((s - 1) // 16 AS BIGINT) AS chunk_id,
       |    array_to_string(t[s:s+15], ' ') AS chunk_text
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1, 16)) AS s
       |        FROM (SELECT doc_id, string_split(text, ' ') AS t
       |              FROM documents))),
       |ckeys AS (SELECT doc_id * $base + chunk_id AS doc_id,
       |          chunk_text AS text FROM ch),
       |${simhashCtesFor(64, "c_", "ckeys")},
       |cut AS (SELECT DISTINCT b.doc_id AS ck
       |  FROM c_s a JOIN c_s b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
       |keptch AS (SELECT * FROM ch
       |  WHERE doc_id * $base + chunk_id NOT IN (SELECT ck FROM cut)),
       |stitched AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_kept,
       |    string_agg(chunk_text, ' ' ORDER BY chunk_id) AS text_clean
       |  FROM keptch GROUP BY doc_id),
       |tot AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_ch
       |        FROM ch GROUP BY doc_id)
       |SELECT t.doc_id,
       |  t.n_ch - coalesce(st.n_kept, 0) AS n_removed_chunks,
       |  coalesce(st.text_clean, '') AS text_clean
       |FROM tot t LEFT JOIN stitched st USING (doc_id)""".stripMargin
  }

  /** q212's per-document release-fate oracle — shared VERBATIM by q214
    * (the continuously-maintained decision log must be hash-equal to
    * the one-shot chain over the same settled corpus). */
  /** The release pipeline's gate chain over an arbitrary (doc_id,
    * lang, text) source CTE, ending with `clean(doc_id, lang, text)` —
    * the gate-passing relation — in scope. Shared verbatim by the
    * one-shot q212 oracle, its maintained twin q214, and the
    * out-of-order rows q226/q227 (which run it over the twin-injected
    * corpus). */
  private def releaseCleanCtes(src: String): String =
    s"""${trainedLangCtesFrom(src)},
       |lok AS (SELECT doc_id FROM pred WHERE lang = lang_pred),
       |longok AS (SELECT doc_id FROM $src
       |           WHERE len(string_split(text, ' ')) >= 25),
       |rrep AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS rep_ratio FROM
       |  (SELECT doc_id, g, count(*) AS c FROM
       |    (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
       |     FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
       |           FROM (SELECT doc_id, string_split(text, ' ') AS t
       |                 FROM $src) WHERE len(t) >= 2))
       |   GROUP BY 1, 2) GROUP BY doc_id),
       |repok AS (SELECT doc_id FROM rrep WHERE rep_ratio < 0.05),
       |clean AS (SELECT doc_id, lang, text FROM $src
       |  WHERE doc_id IN (SELECT doc_id FROM lok)
       |    AND doc_id IN (SELECT doc_id FROM longok)
       |    AND doc_id IN (SELECT doc_id FROM repok))""".stripMargin

  private lazy val releaseDecisionsOracleSql: String = {
    val redSql = "SELECT doc_id, lang, n_tokens FROM red"
    val head = s"""WITH ${releaseCleanCtes("documents")},
       |keep AS (SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(text)),
       |ded AS (SELECT c.doc_id, c.lang, c.text
       |        FROM clean c JOIN keep USING (doc_id))""".stripMargin
    val tail = s"""red AS (SELECT r.doc_id, d.lang, r.final_text AS text,
       |    cast(len(string_split(r.final_text, ' ')) AS BIGINT) AS n_tokens
       |  FROM rel r JOIN ded d USING (doc_id)),
       |${Sampling.temperatureBudgetCtes(redSql, "lang", "n_tokens", 6000L)},
       |tmixed AS (SELECT doc_id, lang, n_tokens,
       |    ${Sampling.cumTokensSql("doc_id", "lang", "n_tokens", "temp")} AS cum
       |  FROM red),
       |mx AS (SELECT m.doc_id FROM tmixed m
       |       JOIN tbudget b ON m.lang = b.domain WHERE m.cum <= b.b)
       |SELECT d.doc_id,
       |  CASE WHEN d.doc_id NOT IN (SELECT doc_id FROM lok) THEN 'gate_lang'
       |       WHEN d.doc_id NOT IN (SELECT doc_id FROM longok) THEN 'gate_len'
       |       WHEN d.doc_id NOT IN (SELECT doc_id FROM repok) THEN 'gate_rep'
       |       WHEN d.doc_id NOT IN (SELECT doc_id FROM ded) THEN 'dedup_exact'
       |       WHEN d.doc_id NOT IN (SELECT doc_id FROM rel) THEN 'substring_drop'
       |       WHEN d.doc_id NOT IN (SELECT doc_id FROM mx) THEN 'mix_budget'
       |       ELSE 'kept' END AS fate
       |FROM documents d""".stripMargin
    head + ",\nrel AS (" +
      TextAnalysis.substringReleaseOracleSql(40, src = "ded") + "),\n" + tail
  }

  /** q45's full-corpus near-dup clustering oracle — shared VERBATIM by
    * q181 (incremental maintenance must be hash-equal to the full
    * recompute). */
  private lazy val nearDupClustersOracleSql: String =
    shingleBase5.replaceFirst("WITH ", "WITH RECURSIVE ") + cappedJaccardPairsSql +
      """, qual AS (
        |  SELECT doc_a, doc_b FROM pairs
        |  JOIN cnt ca ON doc_a = ca.doc_id
        |  JOIN cnt cb ON doc_b = cb.doc_id
        |  WHERE cast(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5),
        |sym AS (SELECT doc_a AS a, doc_b AS b FROM qual
        |        UNION ALL SELECT doc_b, doc_a FROM qual),
        |reach(a, b) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
        |canon AS (SELECT a AS id, least(a, min(b)) AS canonical
        |          FROM reach GROUP BY a),
        |lab AS (SELECT d.doc_id, coalesce(c.canonical, d.doc_id) AS canonical_id
        |        FROM documents d LEFT JOIN canon c ON d.doc_id = c.id)
        |SELECT doc_id, canonical_id,
        |       count(*) OVER (PARTITION BY canonical_id) AS cluster_size
        |FROM lab""".stripMargin

  /** [[TextAnalysis.trainedLangId]]'s oracle CTE chain, ending with
    * `pred(doc_id, lang, lang_pred)` in scope — generated from the
    * same marker/bucket constants the engine uses. */
  private lazy val trainedLangCtes: String = trainedLangCtesFrom("documents")

  /** [[trainedLangCtes]] over an arbitrary (doc_id, lang, text) source
    * CTE — the q226/q227 out-of-order rows run the release gate chain
    * over the twin-injected corpus, not the raw table. */
  private def trainedLangCtesFrom(src: String): String = {
    val d = TextAnalysis.LangFeatureBuckets
    def caseOver(rep: Int) = TextAnalysis.TrainedLangs.map(l =>
      s"WHEN '$l' THEN '${TextAnalysis.langMarkerPhrase(l, rep)}'").mkString(" ")
    s"""inj AS (SELECT doc_id, lang, text || ' ' ||
       |    (CASE WHEN doc_id % 20 = 3
       |          THEN (CASE lang ${caseOver(TextAnalysis.LangMarkerWeakRep)} ELSE '' END)
       |          ELSE (CASE lang ${caseOver(TextAnalysis.LangMarkerRep)} ELSE '' END)
       |     END) AS mtext
       |  FROM $src),
       |ltf AS (SELECT doc_id, lang, tok
       |  FROM (SELECT doc_id, lang, unnest(string_split(mtext, ' ')) AS tok
       |        FROM inj)
       |  WHERE len(tok) > 0),
       |ltb AS (SELECT doc_id, lang,
       |          cast(${sqlHash64("tok")} % $d AS INT) AS bucket
       |        FROM ltf),
       |ltr AS (SELECT * FROM ltb WHERE doc_id % 2 = 0),
       |lwc AS (SELECT lang AS lang_cand, bucket, cast(count(*) AS BIGINT) AS cnt
       |        FROM ltr GROUP BY 1, 2),
       |lwt AS (SELECT lang AS lang_cand, cast(count(*) AS BIGINT) AS tot
       |        FROM ltr GROUP BY 1),
       |lw AS (SELECT lang_cand, bucket, cnt * 1000000 // tot AS w
       |       FROM lwc JOIN lwt USING (lang_cand)),
       |lte AS (SELECT doc_id, lang, bucket, cast(count(*) AS BIGINT) AS cnt
       |        FROM ltb WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3),
       |lsc AS (SELECT lte.doc_id, lte.lang, lw.lang_cand,
       |          cast(sum(lte.cnt * lw.w) AS BIGINT) AS score
       |        FROM lte JOIN lw USING (bucket) GROUP BY 1, 2, 3),
       |pred AS (SELECT doc_id, lang, lang_cand AS lang_pred FROM (
       |  SELECT doc_id, lang, lang_cand,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY score DESC, lang_cand) AS rn
       |  FROM lsc) WHERE rn = 1)""".stripMargin
  }
}
