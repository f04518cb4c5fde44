package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: marker-word
  * language ID, quality scoring, token counting, and a polynomial
  * rolling-hash document fingerprint. Everything is a fixed expression
  * tree over exact integers (or a final single division), so the DuckDB
  * oracle reproduces results bit-for-bit.
  */
object TextAnalysis {

  /** Marker words per language (n-gram heuristic stand-in; the fixture
    * vocabulary is synthetic so markers are arbitrary but fixed). Order
    * matters: it is the deterministic tie-break.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "table", "row"),
    "de" -> Seq("der", "spark", "query"),
    "fr" -> Seq("le", "join", "merge"),
    "es" -> Seq("el", "hash", "scan"),
    "zh" -> Seq("zh", "batch", "stream"))

  /** #occurrences of `w` in `text` via length difference — exact ints. */
  def occurrences(text: Column, w: String): Column =
    (length(text) - length(call_function("replace", text, lit(w), lit("")))) / w.length

  /** argmax-of-marker-scores language guess as a pure expression.
    * Earlier-listed languages win ties (the original fold used strict
    * >), encoded as the lexicographic max of (score, -listIndex, lang)
    * structs so every score subtree is evaluated exactly ONCE — the
    * previous when/otherwise fold embedded each running-best score
    * subtree twice per step, growing the expression tree ~2^|langs|
    * (measured r20: 1.10 s for this projection alone over the sf0.1
    * corpus scan; the struct argmax reads identical, see
    * OPTIMIZATION_r20.md). All-null scores (null text) fall through to
    * the first-listed language either way: null scores compare equal,
    * so -listIndex picks index 0 — the fold's seed. */
  def langGuessExpr(text: Column): Column = {
    val cand = LangMarkers.zipWithIndex.map { case ((lang, ws), i) =>
      struct(ws.map(w => occurrences(text, w)).reduce(_ + _).as("s"),
        lit(-i).as("r"), lit(lang).as("l"))
    }
    array_max(array(cand: _*)).getField("l")
  }

  /** Language-ID: argmax of summed marker-word occurrences, first-listed
    * language wins ties. Emits (doc_id, lang_guess, lang, is_match).
    */
  def langId(docs: DataFrame): DataFrame = {
    val guess = langGuessExpr(col("text"))
    docs.select(col("doc_id"), guess.as("lang_guess"), col("lang"),
      (guess === col("lang")).as("is_match"))
  }

  // ── trained language router (hashed linear model) ──────────────────
  // The raw fixture's `lang` label is statistically INDEPENDENT of its
  // text (q169's weak diagonal is structural, not a router defect: a
  // full multinomial NB trained on the corpus itself reads 47% — the
  // majority-class rate). A trained router therefore exercises against
  // an INJECTED language signal (the q64/q131 typed-injection
  // discipline): most documents carry a strong per-language marker
  // phrase, the doc_id % 20 = 3 slice only a weak one — the hard
  // subset that keeps the measurement non-trivial. Training happens
  // IN-QUERY on the even-id half; the odd half is held out for
  // evaluation. All arithmetic is exact integers (ppm bucket
  // frequencies, integer dot products), so the DuckDB oracle replays
  // injection → hashing → training → scoring bit-for-bit.

  /** Languages the trained router knows — LangMarkers' key set. */
  val TrainedLangs: Seq[String] = LangMarkers.map(_._1)

  /** Hashed-feature dimensionality of the trained router (the q131
    * hashing-trick discipline — no vocabulary table). */
  val LangFeatureBuckets: Int = 256

  /** Marker repetitions for the strong (default) injection. */
  val LangMarkerRep: Int = 6

  /** Marker repetitions for the weak (doc_id % 20 = 3) injection — few
    * enough that natural-text noise can occasionally outvote them. */
  val LangMarkerWeakRep: Int = 2

  /** The marker phrase injected for `lang`: 3 distinct marker tokens,
    * `rep` repetitions each. SAME constant feeds engine and oracle. */
  def langMarkerPhrase(lang: String, rep: Int): String =
    (0 until 3).flatMap(i => Seq.fill(rep)(s"mk$lang$i")).mkString(" ")

  /** Trained language identification: per-language weight vectors over
    * hashed token features are TRAINED in-query on the even-doc_id
    * half of the (marker-injected) corpus — w[l][b] = lang l's ppm
    * token frequency in bucket b, the multinomial class-conditional in
    * exact integers — and every odd-doc_id document classifies by
    * argmax of Σ_buckets count·w (ties: bytewise-smallest language).
    * Emits (doc_id, lang, lang_pred, is_match) for the held-out half.
    *
    * Scale shape: ONE corpus scan feeds both halves (token explode +
    * two partial-aggregated exchanges); the weight relation is
    * |langs|×|buckets| ≤ 1280 rows BY CONSTRUCTION and broadcasts into
    * the scoring join; the argmax is the q139 min/max-encoding
    * aggregate — no corpus-sized join-back, no window over the corpus.
    * Documents whose every bucket is untrained drop from the output on
    * both engines (cannot happen when train and test share a natural
    * vocabulary — documented, not silent).
    */
  def trainedLangId(docs: DataFrame): DataFrame =
    trainedLangIdWith(docs, langIdWeights(docs))

  /** The marker-augmented hashed-bucket token relation both halves of
    * the trained router share: (doc_id, lang, bucket). */
  private def langIdToks(docs: DataFrame): DataFrame = {
    graft.functions.Md5Prefix64.register(docs.sparkSession)
    val d = LangFeatureBuckets
    def markerExpr(rep: Int): Column =
      TrainedLangs.foldLeft(lit(null).cast("string")) {
        case (acc, l) =>
          when(col("lang") === l, lit(langMarkerPhrase(l, rep))).otherwise(acc)
      }
    val mtext = concat_ws(" ", col("text"),
      when(col("doc_id") % 20 === 3, markerExpr(LangMarkerWeakRep))
        .otherwise(markerExpr(LangMarkerRep)))
    docs.select(col("doc_id"), col("lang"), mtext.as("mtext"))
      .select(col("doc_id"), col("lang"),
        explode(filter(split(col("mtext"), " "), t => length(t) > 0)).as("tok"))
      .withColumn("bucket", (Dedup.hash64(col("tok")) % d).cast("int"))
  }

  /** The router's TRAINED MODEL as a relation — per-language bucket
    * weights fit on the even-doc_id training half: (lang_cand, bucket,
    * w). This is the artifact a production deployment freezes (write it
    * to parquet once, apply it to every later batch via
    * [[trainedLangIdWith]]): [[trainedLangId]] == train + apply on the
    * same corpus, by construction. */
  def langIdWeights(docs: DataFrame): DataFrame = {
    val train = langIdToks(docs).where(col("doc_id") % 2 === 0)
    val wcnt = train.groupBy(col("lang").as("lang_cand"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val wtot = train.groupBy(col("lang").as("lang_cand"))
      .agg(count(lit(1)).as("tot"))
    wcnt.join(wtot, "lang_cand")
      .select(col("lang_cand"), col("bucket"),
        expr("cnt * 1000000 div tot").as("w"))
  }

  /** Score the holdout half (odd doc_ids) of `docs` with a FROZEN
    * weight relation — the apply half of [[trainedLangId]], split out
    * so a streaming consumer can gate each batch against a model trained
    * once on a reference corpus instead of retraining per batch. */
  def trainedLangIdWith(docs: DataFrame, wts: DataFrame): DataFrame = {
    val langsSorted = TrainedLangs.sorted
    val nL = langsSorted.length
    val te = langIdToks(docs).where(col("doc_id") % 2 === 1)
      .groupBy(col("doc_id"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    // argmax via the q139 encoding: enc = score·nL + (nL−1−rank) so
    // max(enc) is (max score, then bytewise-smallest language); scores
    // are ≥ 0 and ≤ tokens·10⁶ ≪ Long.MaxValue/nL, so the encoding is
    // collision-free and decode is enc % nL
    val rankExpr = langsSorted.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (l, r)) => when(col("lang_cand") === l, lit(r.toLong)).otherwise(acc)
    }
    val scored = te.join(org.apache.spark.sql.functions.broadcast(wts), "bucket")
      .groupBy(col("doc_id"), col("lang"), col("lang_cand"))
      .agg(sum(col("cnt") * col("w")).as("score"))
    val best = scored
      .select(col("doc_id"), col("lang"),
        (col("score") * nL + (lit(nL - 1).cast("long") - rankExpr)).as("enc"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(max(col("enc")).as("enc"))
    val rk = (lit(nL - 1) - col("enc") % nL).cast("int")
    val predExpr = langsSorted.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (l, r)) => when(rk === r, lit(l)).otherwise(acc)
    }
    best.select(col("doc_id"), col("lang"), predExpr.as("lang_pred"),
      (predExpr === col("lang")).as("is_match"))
  }

  val Stopwords: Seq[String] = Seq("the", "a", "data", "key", "value")

  /** Quality signals: token count, mean token length, stopword ratio,
    * digit ratio, and a blended score. Text is single-space tokenized;
    * ratios are single divisions of exact integers.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("long")
    val sumTokLen = (length(col("text")) - (nTok - 1)).cast("long") // single-spaced
    val nStop = Stopwords
      .map(w => size(filter(toks, t => t === w)).cast("long")).reduce(_ + _)
    val meanLen = sumTokLen.cast("double") / nTok
    val stopRatio = nStop.cast("double") / nTok
    docs.select(
      col("doc_id"), nTok.as("n_tokens"), meanLen.as("mean_token_len"),
      stopRatio.as("stopword_ratio"),
      (meanLen * 0.1 + stopRatio).as("quality_score"))
  }

  /** Scala-side twin of `Dedup.hash64` (60-bit md5 prefix) reduced to a
    * feature bucket — used to BUILD hashed-feature models driver-side
    * with exactly the arithmetic the engine and the DuckDB oracle
    * apply per token (a spec pins the parity). */
  def md5Bucket(token: String, d: Int): Int = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    (java.lang.Long.parseLong(
      dig.take(8).map("%02x".format(_)).mkString.take(15), 16) % d).toInt
  }

  /** A planted fastText-class model for [[linearQualityScore]]: 64
    * hash buckets, stopword buckets weighted +4, everything else −1 —
    * function-word density is the classic linear-quality signal. The
    * SAME constant generates the engine literals and the oracle SQL
    * (the q122 shared-constants discipline), so the two cannot drift.
    */
  lazy val DefaultQualityWeights: Array[Long] = {
    val w = Array.fill(64)(-1L)
    Stopwords.foreach(s => w(md5Bucket(s, 64)) = 4L)
    w
  }

  /** fastText-class LINEAR quality classifier — production pipelines
    * score documents with a trained linear model over hashed token
    * features, not heuristics ([[qualityScore]]): each token hashes
    * into one of `weights.length` buckets (the hashing trick — no
    * vocabulary table, O(1) memory) and the document's raw score is
    * bias + Σ_tokens weights[h(tok) % D], kept iff score > 0. All
    * integer arithmetic, so any engine replays it exactly.
    *
    * Scale shape: a pure narrow per-row fold (`aggregate` HOF over the
    * token array — the weight vector rides as an array LITERAL, the
    * q121 map-literal discipline): zero joins, zero exchanges, one
    * corpus scan; the model is metadata-sized by construction. Emits
    * (doc_id, n_tokens, score_raw, keep) for every doc — an empty doc
    * scores exactly `bias`.
    */
  /** The [[linearQualityScore]] scoring expression alone — for callers
    * that need the score alongside their own projection (e.g. the
    * per-language gate) without a join-back. Callers must register
    * Md5Prefix64 first. */
  def linearScoreCol(text: Column, weights: Array[Long],
                     bias: Long = 0L): Column = {
    require(weights.nonEmpty, "linearScoreCol needs a weight vector")
    val d = weights.length
    val wArr = array(weights.toIndexedSeq.map(lit): _*)
    val toks = filter(split(text, " "), t => length(t) > 0)
    aggregate(toks, lit(bias),
      (acc, t) => acc + element_at(wArr, (Dedup.hash64(t) % d).cast("int") + 1))
  }

  def linearQualityScore(docs: DataFrame, weights: Array[Long],
                         bias: Long = 0L): DataFrame = {
    graft.functions.Md5Prefix64.register(docs.sparkSession)
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    docs
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        linearScoreCol(col("text"), weights, bias).as("score_raw"))
      .withColumn("keep", col("score_raw") > 0)
  }

  /** Token counting three ways: whitespace split, BPE-ish regex pieces
    * (letter runs / digit runs / single other), distinct tokens.
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_ws"),
      regexp_count(col("text"), lit("[a-z]+|[0-9]+")).cast("long").as("n_re"),
      size(array_distinct(toks)).cast("long").as("n_uniq"))
  }

  /** Blocked threshold-edit-distance verify over the leading `window`
    * characters: candidate pairs block on PREFIX-`blockLen` equality
    * UNION SUFFIX-`blockLen` equality (suffix taken by explicit start
    * arithmetic, `substr(t, max(len-blockLen+1, 1), blockLen)`, NOT by
    * reversing — Spark's reverse() works on codepoints while DuckDB's
    * works on grapheme clusters, so on combining sequences the two
    * engines would derive different "S|" keys; the arithmetic form
    * indexes identical codepoints in both), deduped, then verified with
    * the banded O(maxDist·n) Levenshtein DP — per-pair cost scales with
    * the threshold, not len², and kept distances are exact.
    *
    * Recall contract: a near-dup pair is found iff its edits leave the
    * window's first OR last `blockLen` characters untouched — the
    * two-block union catches the common "typo in the first word" case
    * a prefix-only block structurally drops. Pairs edited at BOTH ends
    * within the window are still missed: that residue is inherent to
    * equi-join blocking (an all-pairs verify is the O(n²) this stage
    * exists to avoid); the q107 positional-q-gram spans are the
    * finer-grained tool when it matters. Blocks carry a kind tag so a
    * prefix never collides with a suffix. Scale shape: two map-side
    * projections of one scan, one equi-join on the block key, volume
    * bounded by block-bucket² (the q77 banded discipline).
    */
  def editDistancePairs(docs: DataFrame, window: Int = 48,
                        blockLen: Int = 16, maxDist: Int = 8): DataFrame = {
    val p = docs.select(col("doc_id"),
      substring(col("text"), 1, window).as("t"))
    val blocks = p.select(
        concat(lit("P|"), substring(col("t"), 1, blockLen)).as("blk"),
        col("doc_id"), col("t"))
      .unionByName(p.select(
        concat(lit("S|"), col("t").substr(
          greatest(length(col("t")) - (blockLen - 1), lit(1)),
          lit(blockLen))).as("blk"),
        col("doc_id"), col("t")))
    blocks.select(col("blk"), col("doc_id").as("doc_a"), col("t").as("ta"))
      .join(blocks.select(col("blk"), col("doc_id").as("doc_b"), col("t").as("tb")),
        Seq("blk"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("ta"), col("tb")).distinct()
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb"), maxDist).cast("long").as("dist"))
      .where(col("dist") >= 0)
  }

  /** EXACT-substring duplicate spans at byte resolution — the Lee et
    * al. (2021) "Deduplicating Training Data Makes Language Models
    * Better" capability, re-shaped for Spark: instead of a sequential
    * suffix array, a distributed anchor-group-extend pass.
    *
    *  1. ANCHOR: every character position emits the xxhash64 of its
    *     length-`minLen` window (one generate + project — only the
    *     8-byte hash and coordinates shuffle, never the anchor text);
    *  2. GROUP: the hash equi-join yields cross-document candidate
    *     alignments (doc_a < doc_b);
    *  3. EXTEND: candidates re-attach their texts (two docs-sized
    *     joins), keep only LEFT-MAXIMAL alignments (preceding
    *     characters differ, or a document starts), and extend right
    *     with the codegen'd [[graft.functions.CommonPrefixChars]]
    *     kernel. `match_len >= minLen` both enforces the floor and
    *     kills hash collisions (no unverified hash survives).
    *
    * Output: one row per MAXIMAL cross-document match — (doc_a, doc_b,
    * pos_a, pos_b, match_len), 1-based positions, lengths in
    * characters (== bytes on ASCII; multi-byte codepoints match
    * whole-or-not via the kernel). Periodic text yields one row per
    * distinct maximal alignment — the correct, complete answer.
    *
    * Scale economics, stated honestly: the anchor relation is ~24
    * bytes per corpus CHARACTER — a corpus-bytes-sized shuffle, the
    * price Lee et al. pay in suffix-array construction. That is the
    * cost of byte-exact longest matches; the k-gram span operators
    * (q107/q113, alpha ≈ 0.55 measured) remain the cheap tier when
    * k-gram resolution suffices, and production deployments of THIS
    * operator shard the anchor join by corpus partition (the hash key
    * distributes uniformly, no skew) or sample anchors
    * (winnowing/minimizers) at a documented recall floor. */
  def exactSubstringPairs(docs: DataFrame, minLen: Int): DataFrame = {
    val L = minLen
    val spark = docs.sparkSession
    graft.functions.CommonPrefixChars.register(spark)
    // widened (r20): the one-anchor-per-character generate + hash is
    // scan-stage CPU work — one task at fixture scale, no-op on wide
    // inputs; the extension joins reread the same widened relation
    val d = graft.util.Scale.widen(docs.select(col("doc_id"), col("text")))
      .where(length(col("text")) >= L)
    val g = d
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - (L - 1))).as("i"),
        col("text"))
      .select(col("doc_id"), col("i"),
        xxhash64(expr(s"substring(text, i, $L)")).as("h"))
    // shuffle_hash pinned on BOTH sides: the anchor relation is one row
    // per corpus character, so Catalyst's size estimate (propagated from
    // the tiny parquet through the Generate) undershoots by ~50× and
    // would BROADCAST a corpus-character-sized hash table — fine on a
    // fixture, an executor/driver OOM at scale (PlanSpec pins the
    // shuffle). Measured at sf0.1 the shuffle is also FASTER than the
    // mis-chosen broadcast: 1.9 s vs 3.9 s.
    val pairs = g.select(col("h"), col("doc_id").as("doc_a"), col("i").as("pos_a"))
      .hint("shuffle_hash")
      .join(g.select(col("h"), col("doc_id").as("doc_b"), col("i").as("pos_b"))
        .hint("shuffle_hash"), Seq("h"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("pos_a"), col("doc_b"), col("pos_b"))
    pairs
      .join(d.select(col("doc_id").as("doc_a"), col("text").as("ta")), Seq("doc_a"))
      .join(d.select(col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_b"))
      .where(col("pos_a") === 1 || col("pos_b") === 1 ||
        expr("substring(ta, pos_a - 1, 1) != substring(tb, pos_b - 1, 1)"))
      .withColumn("match_len", call_function("common_prefix_chars",
        expr("substring(ta, pos_a)"), expr("substring(tb, pos_b)")))
      .where(col("match_len") >= L)
      .select(col("doc_a"), col("doc_b"), col("pos_a"), col("pos_b"),
        col("match_len"))
  }

  /** [[exactSubstringPairs]]' DuckDB oracle — the identical
    * anchor-group-extend pass replayed on raw substrings (no hashing:
    * anchors join on their text, so the oracle needs no collision
    * argument), the extension as a correlated min-mismatch subquery
    * over the few left-maximal rows. Generated from the same `minLen`.
    * `src` parameterizes the corpus relation (default the raw
    * `documents` table; q206 passes its post-dedup CTE) — every
    * downstream substring oracle threads it through. */
  def exactSubstringOracleSql(minLen: Int, src: String = "documents"): String = {
    val L = minLen
    s"""WITH doc AS (SELECT doc_id, text FROM $src WHERE len(text) >= $L),
       |a AS (SELECT doc_id, text,
       |        unnest(range(1, len(text) - ${L - 1} + 1)) AS i
       |      FROM doc),
       |g AS (SELECT substr(text, i, $L) AS anc, doc_id, i, text FROM a),
       |pairs AS (SELECT x.doc_id AS doc_a, x.i AS pos_a, x.text AS ta,
       |                 y.doc_id AS doc_b, y.i AS pos_b, y.text AS tb
       |          FROM g x JOIN g y ON x.anc = y.anc AND x.doc_id < y.doc_id),
       |lm AS (SELECT * FROM pairs
       |       WHERE pos_a = 1 OR pos_b = 1
       |          OR substr(ta, pos_a - 1, 1) <> substr(tb, pos_b - 1, 1)),
       |ext AS (SELECT doc_a, doc_b, pos_a, pos_b,
       |  coalesce((SELECT min(j) FROM
       |      (SELECT unnest(range(1, least(len(ta) - pos_a, len(tb) - pos_b) + 2)) AS j) s
       |      WHERE substr(ta, pos_a + j - 1, 1) <> substr(tb, pos_b + j - 1, 1)),
       |    least(len(ta) - pos_a, len(tb) - pos_b) + 2) - 1 AS match_len
       |  FROM lm)
       |SELECT doc_a, doc_b, pos_a, pos_b, match_len
       |FROM ext WHERE match_len >= $L""".stripMargin
  }

  /** [[exactSubstringPairs]]' sub-linear tier: WINNOWED fingerprints
    * (Schleimer et al. 2003, the MOSS local sampling scheme) instead of
    * one anchor per character.
    *
    * Per document — entirely INSIDE the row, zero shuffle before the
    * fingerprint join — every position's `k`-gram hashes; each window
    * of `w` consecutive hashes selects its rightmost minimum; the
    * distinct selected positions (expected density 2/(w+1), an ~
    * (w+1)/2× reduction of the q196 anchor volume) are the only rows
    * that reach the hash equi-join. Candidates then extend BOTH ways
    * (the selected anchor sits mid-match, unlike q196's left-maximal
    * anchors): left via the [[graft.functions.CommonPrefixChars]]
    * kernel over reversed prefixes, right over suffixes; one row per
    * distinct maximal alignment survives.
    *
    * GUARANTEED-RECALL CONTRACT: every maximal cross-document match
    * with `match_len >= w + k - 1` is found. (Such a match spans >= w
    * consecutive aligned k-gram anchors, so one window lies entirely
    * inside it in BOTH documents; identical hash sequences with the
    * shared rightmost-min tie-break select the same aligned anchor on
    * both sides.) Every emitted row is a true maximal match regardless
    * of hash collisions — extension verifies bytes, a colliding anchor
    * merely wastes a candidate. Output is therefore EXACTLY
    * [[exactSubstringPairs]] (minLen = w+k-1): the registered oracle is
    * [[exactSubstringOracleSql]] VERBATIM, so the driver gate itself
    * proves the sampled pass loses nothing above the guarantee.
    *
    * Scale economics: one O(n) kernel pass per document
    * ([[graft.functions.WinnowFingerprints]] — rolling hash +
    * monotonic-deque sliding minimum, computed map-side and never
    * shuffled); what shrinks ~(w+1)/2× is everything the q196 shape
    * SHUFFLES — the anchor relation feeding the self-join and the
    * candidate volume. (A declarative per-window slice-and-fold
    * selection was measured 4× SLOWER than the unsampled pass it was
    * meant to undercut — O(n·w) with three allocations per window;
    * the deque kernel is why this tier actually wins.)
    */
  /** `maxAnchorDf` — the HOT-ANCHOR cap (0 = uncapped, the exact
    * clique semantics q197's oracle states). The anchor self-join is
    * quadratic PER GROUP: a passage duplicated across a million
    * documents (site chrome at crawl scale) puts ~10⁶ rows under one
    * fingerprint and the clique emits ~10¹² pairs — the same
    * one-hot-bucket blowup the q31 stop-shingle cap guards, except
    * here every pair is a TRUE match, so pairs can't just be dropped.
    * With the cap, anchors whose fingerprint group exceeds `maxAnchorDf`
    * rows emit a STAR around the group's deterministic representative
    * (min (doc_id, pos)) instead of the clique — group-linear volume.
    *
    * What the star guarantees (spec-pinned on planted mega-boilerplate
    * fixtures, including end-to-end through [[substringRelease]]):
    * every non-representative document still pairs with the
    * representative (rep = min doc_id, so rep is always doc_a and the
    * hot span lands in the member as doc_b) — no member escapes its
    * cut, and keep-earliest keeps exactly the representative. The
    * effect on release evidence is MONOTONE SOFTENING: every star pair
    * is a clique pair, so capped coverage ≤ clique coverage per doc,
    * capped drops ⊆ clique drops, and survivors keep at least as many
    * characters. What the star under-scores is member×member sharing
    * AROUND the hot core: ≥-floor extra sharing generates cold anchors
    * of its own and is always found; SUB-floor extra context (a few
    * coinciding boundary characters, or near-containment that rode
    * exactly that context) is attributed through the representative
    * and may soften a borderline drop to a cut.
    */
  def winnowedSubstringPairs(docs: DataFrame, k: Int = 20, w: Int = 21,
      maxAnchorDf: Int = 0): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got ($k, $w)")
    val G = w + k - 1
    // NOT widened (r20): measured — the widen exchange cost the fast
    // winnow-tier queries (q197/q198/q213, all ≤1.3 s) +0.2–0.8 s
    // against a sub-second kernel scan; only the unsampled q196-shape
    // operators benefit (see exactSubstringPairs)
    val d = docs.select(col("doc_id"), col("text"))
      .where(length(col("text")) >= G)
    val fp = winnowFingerprintsOf(d, k, w)
    // same shuffle_hash pin as q196: Catalyst's estimate undershoots the
    // exploded fingerprint relation and would broadcast it
    def cliquePairs(f: DataFrame) = f
      .select(col("h"), col("doc_id").as("doc_a"), col("pos").as("pa"))
      .hint("shuffle_hash")
      .join(f.select(col("h"), col("doc_id").as("doc_b"),
          col("pos").as("pb")).hint("shuffle_hash"), Seq("h"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("pa"), col("doc_b"), col("pb"))
    val pairs =
      if (maxAnchorDf <= 0) cliquePairs(fp)
      else {
        val dfRel = fp.groupBy(col("h")).agg(count(lit(1)).as("df"))
        val cold = fp.join(dfRel.where(col("df") <= maxAnchorDf)
          .select(col("h")).hint("shuffle_hash"), Seq("h"))
        val hot = fp.join(dfRel.where(col("df") > maxAnchorDf)
          .select(col("h")).hint("shuffle_hash"), Seq("h"))
        val rep = hot.groupBy(col("h"))
          .agg(min(struct(col("doc_id"), col("pos"))).as("r"))
          .select(col("h"), col("r").getField("doc_id").as("doc_a"),
            col("r").getField("pos").as("pa"))
        val star = hot.join(rep.hint("shuffle_hash"), Seq("h"))
          .where(col("doc_id") > col("doc_a"))
          .select(col("doc_a"), col("pa"),
            col("doc_id").as("doc_b"), col("pos").as("pb"))
        cliquePairs(cold).unionByName(star)
      }
    extendAnchorCandidates(pairs, d, G)
  }

  /** The winnowed fingerprint relation (doc_id, pos, h) of `d` —
    * one O(n) kernel pass per document, map-side, never shuffled. `d`
    * must already be projected to (doc_id, text) and length-filtered. */
  private def winnowFingerprintsOf(d: DataFrame, k: Int, w: Int)
      : DataFrame = {
    graft.functions.WinnowFingerprints.register(d.sparkSession)
    d.select(col("doc_id"),
        explode(call_function("winnow_fingerprints",
          col("text"), lit(k), lit(w))).as("f"))
      .select(col("doc_id"),
        col("f").getField("pos").as("pos"),
        col("f").getField("h").as("h"))
  }

  /** BOTH-WAYS extension of aligned anchor candidates (doc_a, pa,
    * doc_b, pb) over the text relation `d` (doc_id, text): left via
    * the CommonPrefixChars kernel on reversed prefixes, right on
    * suffixes; keeps maximal matches >= G and dedups alignments. */
  private def extendAnchorCandidates(cand: DataFrame, d: DataFrame,
      G: Int): DataFrame = {
    graft.functions.CommonPrefixChars.register(d.sparkSession)
    cand
      .join(d.select(col("doc_id").as("doc_a"), col("text").as("ta")),
        Seq("doc_a"))
      .join(d.select(col("doc_id").as("doc_b"), col("text").as("tb")),
        Seq("doc_b"))
      .withColumn("left_ext", call_function("common_prefix_chars",
        reverse(expr("substring(ta, 1, pa - 1)")),
        reverse(expr("substring(tb, 1, pb - 1)"))))
      .withColumn("match_len", col("left_ext") +
        call_function("common_prefix_chars",
          expr("substring(ta, pa)"), expr("substring(tb, pb)")))
      .where(col("match_len") >= G)
      .select(col("doc_a"), col("doc_b"),
        (col("pa") - col("left_ext")).cast("int").as("pos_a"),
        (col("pb") - col("left_ext")).cast("int").as("pos_b"),
        col("match_len"))
      .distinct()
  }

  /** Persists the winnowed fingerprint INDEX of a settled corpus —
    * the artifact that makes substring dedup INCREMENTALLY
    * maintainable: a new batch probes this relation without the
    * engine ever recomputing corpus fingerprints (the q134/q191
    * persisted-store discipline applied to the newest tier). Layout:
    * (doc_id, pos, h) parquet. */
  def saveSubstringIndex(corpus: DataFrame, path: String, minLen: Int,
      k: Int = 20): Unit = {
    require(minLen > k, s"need minLen > k, got ($minLen, $k)")
    val w = minLen - k + 1
    val d = corpus.select(col("doc_id"), col("text"))
      .where(length(col("text")) >= minLen)
    winnowFingerprintsOf(d, k, w).write.mode("overwrite").parquet(path)
  }

  /** APPEND a batch's fingerprints to an existing (or new) substring
    * index — the incremental-maintenance half
    * ([[graft.streaming.StreamIngest.maintainSubstringIndex]]'s per-
    * batch write): the settled index files are never rewritten, the
    * batch contributes only its own O(batch) kernel pass. Caller owns
    * the replay guard (ids must not be appended twice). */
  def appendSubstringIndex(batch: DataFrame, path: String, minLen: Int,
      k: Int = 20): Unit =
    substringIndexRows(batch, minLen, k).write.mode("append").parquet(path)

  /** The batch's index contribution as ROWS (doc_id, pos, h) — the
    * deterministic winnow kernel pass behind [[appendSubstringIndex]],
    * exposed so replay-guarded maintainers can heal TORN appends: a
    * crash mid-append can leave a strict subset of a document's
    * fingerprint rows visible, and a doc-grain presence guard would
    * then skip the document forever (an incomplete index silently
    * voids the winnow-losslessness completeness argument). Fingerprints
    * are a pure function of the text, so recomputed rows are
    * bit-identical and an anti-join on the full row appends exactly
    * the missing ones. */
  def substringIndexRows(batch: DataFrame, minLen: Int,
      k: Int = 20): DataFrame = {
    require(minLen > k, s"need minLen > k, got ($minLen, $k)")
    val w = minLen - k + 1
    val d = batch.select(col("doc_id"), col("text"))
      .where(length(col("text")) >= minLen)
    winnowFingerprintsOf(d, k, w)
  }

  /** Cross-corpus maximal matches of a NEW BATCH against the persisted
    * fingerprint index — incremental exact-substring dedup's probe
    * half. The batch pays its own winnow kernel pass (batch-sized);
    * the corpus contributes only (a) the index parquet scan and (b)
    * one text re-attach join (match-sized keys, so the candidate side
    * broadcasts and the corpus never shuffles). Output rows are
    * oriented doc_a < doc_b with positions swapped accordingly, so the
    * result is EXACTLY [[winnowedSubstringPairs]] over corpus ∪ batch
    * restricted to cross pairs — which the oracle states as the exact
    * pass filtered to cross-split pairs (the recall guarantee holds
    * per pair: a window inside the match selects the same aligned
    * anchor in index build and batch probe alike). */
  def substringPairsAgainstIndex(batch: DataFrame, corpus: DataFrame,
      indexPath: String, minLen: Int, k: Int = 20): DataFrame = {
    require(minLen > k, s"need minLen > k, got ($minLen, $k)")
    val w = minLen - k + 1
    val spark = batch.sparkSession
    val bd = batch.select(col("doc_id"), col("text"))
      .where(length(col("text")) >= minLen)
    val bf = winnowFingerprintsOf(bd, k, w)
    // The index may already contain THIS batch's own fingerprints — the
    // maintainSubstringIndex crash window between the fp append and the
    // texts write replays the whole batch against a store that already
    // indexed it. Probing such rows emits self-pairs (doc_a == doc_b)
    // and within-batch pairs that the pairs-log distinct cannot fold
    // (they did not exist in the first attempt's output). Restrict the
    // probe to SETTLED documents by anti-joining the batch ids off the
    // index side; the batch id relation broadcasts (batch-sized — the
    // corpus-sized index is the left, streamed side).
    val cf = spark.read.parquet(indexPath)
      .join(broadcast(bd.select(col("doc_id"))), Seq("doc_id"), "left_anti")
    // shuffle_hash pin: the BATCH fingerprint relation is generate-
    // exploded (Catalyst undershoots it), and the index side is
    // corpus-sized — neither may be broadcast on size guesses
    val cand = cf
      .select(col("h"), col("doc_id").as("ci"), col("pos").as("cp"))
      .hint("shuffle_hash")
      .join(bf.select(col("h"), col("doc_id").as("bi"),
          col("pos").as("bp")).hint("shuffle_hash"), Seq("h"))
      .select(
        when(col("ci") < col("bi"), col("ci")).otherwise(col("bi"))
          .as("doc_a"),
        when(col("ci") < col("bi"), col("cp")).otherwise(col("bp"))
          .as("pa"),
        when(col("ci") < col("bi"), col("bi")).otherwise(col("ci"))
          .as("doc_b"),
        when(col("ci") < col("bi"), col("bp")).otherwise(col("cp"))
          .as("pb"))
    val texts = corpus.select(col("doc_id"), col("text"))
      .unionByName(bd)
      .where(length(col("text")) >= minLen)
    extendAnchorCandidates(cand, texts, minLen)
  }

  /** Exact-substring dedup's REMOVAL half — Lee et al.'s actual edit:
    * instead of dropping whole near-dup documents, cut the duplicated
    * BYTES. Every maximal cross-document match >= `minLen` chars
    * (found by the winnowed tier [[winnowedSubstringPairs]], proven
    * equal to the exact pass at this floor) marks its span in the pair's
    * LATER document (doc_b of the doc_a < doc_b ordering — keep-earliest,
    * the q30/q57 survivor discipline); per document the spans union
    * (overlaps and adjacency merge), and the kept segments reassemble.
    *
    * Output: one row per AFFECTED document — (doc_id, n_spans,
    * cut_chars, kept_len, cleaned), where `cleaned` is the document
    * with every duplicated span excised. Untouched documents pass
    * through a real corpus copy unchanged, so they are not re-emitted.
    * Intra-document repeats are NOT cut (cross-document matches only;
    * q130/q132 are the within-doc grain).
    *
    * Scale shape: the pair pass is the winnowed join above; everything
    * after is one groupBy(doc_id) of the span relation (match-count-
    * sized, far below corpus-sized), an in-row merge fold, and one join
    * back to documents for the text. */
  /** In-row interval union over a sorted `spans` array column: fold,
    * extending the current interval on overlap OR adjacency, emitting
    * on a gap. Shared by [[exactSubstringCut]] and
    * [[substringCoverage]]. */
  private def mergedIntervals: Column = expr(
    """aggregate(spans,
      |  struct(CAST(array() AS ARRAY<STRUCT<s: BIGINT, e: BIGINT>>) AS done,
      |         CAST(NULL AS STRUCT<s: BIGINT, e: BIGINT>) AS cur),
      |  (acc, sp) -> IF(acc.cur IS NULL,
      |    struct(acc.done AS done, sp AS cur),
      |    IF(sp.s <= acc.cur.e + 1,
      |      struct(acc.done AS done,
      |             struct(acc.cur.s AS s,
      |                    greatest(acc.cur.e, sp.e) AS e) AS cur),
      |      struct(array_append(acc.done, acc.cur) AS done, sp AS cur))),
      |  acc -> array_append(acc.done, acc.cur))""".stripMargin)

  def exactSubstringCut(docs: DataFrame, minLen: Int, k: Int = 20)
      : DataFrame = {
    require(minLen > k, s"need minLen > k, got ($minLen, $k)")
    cutFromPairs(winnowedSubstringPairs(docs, k = k, w = minLen - k + 1), docs)
  }

  /** [[exactSubstringCut]] from an already-computed pair relation —
    * lets [[substringRelease]] pay the winnowed pass ONCE for both its
    * branches. */
  private[graft] def cutFromPairs(pairs: DataFrame, docs: DataFrame): DataFrame = {
    val spans = pairs.select(col("doc_b").as("doc_id"),
        col("pos_b").cast("long").as("s"),
        (col("pos_b") + col("match_len") - 1).as("e"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(struct(col("s"), col("e")))).as("spans"))
    val merged = mergedIntervals
    // reassemble: the gap before each merged span, then the tail
    val cleaned = expr(
      """aggregate(merged,
        |  struct(CAST(1 AS BIGINT) AS nxt, '' AS acc),
        |  (a, m) -> struct(m.e + 1 AS nxt,
        |    concat(a.acc, substring(text, CAST(a.nxt AS INT),
        |                            CAST(m.s - a.nxt AS INT))) AS acc),
        |  a -> concat(a.acc, substring(text, CAST(a.nxt AS INT))))""".stripMargin)
    spans
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .withColumn("merged", merged)
      .select(col("doc_id"),
        size(col("merged")).cast("long").as("n_spans"),
        expr("aggregate(merged, CAST(0 AS BIGINT), (a, m) -> a + m.e - m.s + 1)")
          .as("cut_chars"),
        col("text"), col("merged"))
      .select(col("doc_id"), col("n_spans"), col("cut_chars"),
        (length(col("text")).cast("long") - col("cut_chars")).as("kept_len"),
        cleaned.as("cleaned"))
  }

  /** [[exactSubstringCut]]'s DuckDB oracle: the [[exactSubstringOracleSql]]
    * pass, spans marked in doc_b, the classic gaps-and-islands interval
    * union, and ordered string_agg reassembly. */
  def exactSubstringCutOracleSql(minLen: Int, src: String = "documents"): String = {
    s"""WITH pass AS (${exactSubstringOracleSql(minLen, src)}),
       |spans0 AS (SELECT DISTINCT doc_b AS doc_id, pos_b AS s,
       |                  pos_b + match_len - 1 AS e FROM pass),
       |m1 AS (SELECT doc_id, s, e,
       |         max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |           AS prev_e
       |       FROM spans0),
       |m2 AS (SELECT doc_id, s, e,
       |         sum(CASE WHEN prev_e IS NULL OR s > prev_e + 1
       |                  THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY s, e) AS isl
       |       FROM m1),
       |mg AS (SELECT doc_id, isl, min(s) AS s, max(e) AS e
       |       FROM m2 GROUP BY 1, 2),
       |seg AS (SELECT doc_id, s, e,
       |          lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY s) AS pe
       |        FROM mg)
       |SELECT d.doc_id,
       |  count(*) AS n_spans,
       |  CAST(sum(g.e - g.s + 1) AS BIGINT) AS cut_chars,
       |  CAST(len(d.text) - sum(g.e - g.s + 1) AS BIGINT) AS kept_len,
       |  string_agg(substr(d.text, CAST(g.pe + 1 AS INT),
       |                    CAST(g.s - g.pe - 1 AS INT)), '' ORDER BY g.s)
       |    || substr(d.text, CAST(max(g.e) + 1 AS INT)) AS cleaned
       |FROM seg g JOIN $src d USING (doc_id)
       |GROUP BY d.doc_id, d.text""".stripMargin
  }

  /** Per-pair SUBSTRING COVERAGE — the graded dup score between
    * containment (q155) and whole-document equality: for each candidate
    * pair, the fraction of the LATER document's characters covered by
    * maximal shared spans >= `minLen`. coverage 1000000 ppm = doc_b is
    * a substring-exact copy; ~500000 = half its bytes are lifted. The
    * score dedup policies threshold on when whole-doc dropping is too
    * blunt and span cutting ([[exactSubstringCut]]) too surgical.
    *
    * Same machinery as the cut: winnowed pairs, spans unioned per
    * (doc_a, doc_b) with [[mergedIntervals]], exact-integer ppm (the
    * novelty_ppm discipline). Output: (doc_a, doc_b, covered_chars,
    * len_b, cov_ppm), one row per pair with any span >= minLen. */
  def substringCoverage(docs: DataFrame, minLen: Int, k: Int = 20)
      : DataFrame = {
    require(minLen > k, s"need minLen > k, got ($minLen, $k)")
    coverageFromPairs(winnowedSubstringPairs(docs, k = k, w = minLen - k + 1),
      docs)
  }

  /** [[substringCoverage]] from an already-computed pair relation. */
  private[graft] def coverageFromPairs(pairs: DataFrame, docs: DataFrame)
      : DataFrame = {
    pairs.select(col("doc_a"), col("doc_b"),
        col("pos_b").cast("long").as("s"),
        (col("pos_b") + col("match_len") - 1).as("e"))
      .groupBy("doc_a", "doc_b")
      .agg(sort_array(collect_set(struct(col("s"), col("e")))).as("spans"))
      .withColumn("merged", mergedIntervals)
      .select(col("doc_a"), col("doc_b"),
        expr("aggregate(merged, CAST(0 AS BIGINT), (a, m) -> a + m.e - m.s + 1)")
          .as("covered_chars"))
      .join(docs.select(col("doc_id").as("doc_b"),
        length(col("text")).cast("long").as("len_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("covered_chars"), col("len_b"),
        expr("covered_chars * 1000000 div len_b").as("cov_ppm"))
  }

  /** [[substringCoverage]]'s DuckDB oracle — pass, per-pair islands,
    * covered sum, `//` integer ppm. */
  def substringCoverageOracleSql(minLen: Int, src: String = "documents"): String = {
    s"""WITH pass AS (${exactSubstringOracleSql(minLen, src)}),
       |spans0 AS (SELECT DISTINCT doc_a, doc_b, pos_b AS s,
       |                  pos_b + match_len - 1 AS e FROM pass),
       |m1 AS (SELECT doc_a, doc_b, s, e,
       |         max(e) OVER (PARTITION BY doc_a, doc_b ORDER BY s, e
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |           AS prev_e
       |       FROM spans0),
       |m2 AS (SELECT doc_a, doc_b, s, e,
       |         sum(CASE WHEN prev_e IS NULL OR s > prev_e + 1
       |                  THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_a, doc_b ORDER BY s, e) AS isl
       |       FROM m1),
       |mg AS (SELECT doc_a, doc_b, isl, min(s) AS s, max(e) AS e
       |       FROM m2 GROUP BY 1, 2, 3),
       |cov AS (SELECT doc_a, doc_b,
       |          CAST(sum(e - s + 1) AS BIGINT) AS covered_chars
       |        FROM mg GROUP BY 1, 2)
       |SELECT c.doc_a, c.doc_b, c.covered_chars,
       |  CAST(len(d.text) AS BIGINT) AS len_b,
       |  c.covered_chars * 1000000 // CAST(len(d.text) AS BIGINT) AS cov_ppm
       |FROM cov c JOIN $src d ON d.doc_id = c.doc_b""".stripMargin
  }

  /** The DECISION layer of substring dedup — what a release pipeline
    * actually executes: per document, the strongest duplication
    * evidence against any EARLIER partner (max [[substringCoverage]]
    * ppm as doc_b) routes it to an action — `drop` (≥ `dropPpm`:
    * mostly lifted, remove the document), `cut` (≥ `cutPpm`: lift the
    * spans, keep the rest — [[exactSubstringCut]] is the executor),
    * `keep` below. Thresholds are exact-integer ppm so the routing is
    * engine-reproducible.
    *
    * NON-COVERING OUTPUT CONTRACT — read before joining: this relation
    * has one row per document WITH match evidence ONLY. Evidence-free
    * documents (the clean majority of any real corpus) are implicitly
    * `keep` and are NOT re-emitted (the q198 affected-only discipline:
    * the output stays match-sized, never corpus-sized). A consumer
    * that inner-joins the corpus to this relation — or treats absence
    * as `drop` — silently loses every clean document. The
    * corpus-covering composition is [[substringRelease]] (q202), whose
    * left-join + `coalesce(action, 'keep')` pass-through is the ONLY
    * supported way to apply this policy to a corpus; use it rather
    * than re-deriving the join. Spec-pinned (TextAnalysisSpec:
    * evidence-free ids absent here, present in substringRelease). */
  def substringPolicy(docs: DataFrame, minLen: Int,
      dropPpm: Long = 900000L, cutPpm: Long = 300000L): DataFrame =
    policyFromCoverage(substringCoverage(docs, minLen), dropPpm, cutPpm)

  /** [[substringPolicy]] from an already-computed coverage relation. */
  private[graft] def policyFromCoverage(cov: DataFrame, dropPpm: Long,
      cutPpm: Long): DataFrame = {
    cov
      .groupBy(col("doc_b").as("doc_id"))
      .agg(max(col("cov_ppm")).as("max_cov_ppm"))
      .select(col("doc_id"), col("max_cov_ppm"),
        when(col("max_cov_ppm") >= dropPpm, lit("drop"))
          .when(col("max_cov_ppm") >= cutPpm, lit("cut"))
          .otherwise(lit("keep")).as("action"))
  }

  /** [[substringPolicy]]'s DuckDB oracle. */
  def substringPolicyOracleSql(minLen: Int,
      dropPpm: Long = 900000L, cutPpm: Long = 300000L,
      src: String = "documents"): String = {
    s"""WITH cov AS (${substringCoverageOracleSql(minLen, src)})
       |SELECT doc_b AS doc_id, max(cov_ppm) AS max_cov_ppm,
       |  CASE WHEN max(cov_ppm) >= $dropPpm THEN 'drop'
       |       WHEN max(cov_ppm) >= $cutPpm THEN 'cut'
       |       ELSE 'keep' END AS action
       |FROM cov GROUP BY doc_b""".stripMargin
  }

  /** The EXECUTED release edit of the substring tier — [[substringPolicy]]
    * routing applied to the corpus: dropped documents vanish, cut
    * documents carry [[exactSubstringCut]]'s cleaned text, everything
    * else (including documents with no duplication evidence at all)
    * passes through verbatim. Output is the full post-edit corpus —
    * (doc_id, action, final_len, final_text) — the relation a shard
    * writer consumes next, so this is the composition proof that the
    * q196–q201 family chains into an actual release step (the q190
    * capstone discipline).
    *
    * Scale shape: the winnowed pair pass — the only corpus-sized work —
    * runs ONCE and is localCheckpoint'd (the pair relation is
    * match-sized, far below corpus-sized), then BOTH branches (policy
    * routing and span cutting) derive from the materialized pairs; the
    * final assembly is one corpus-sized left join against each
    * match-sized branch — no new shuffle classes beyond q198/q201. */
  /** `maxAnchorDf` (0 = off) arms the hot-anchor star cap in the pair
    * pass — the production setting for corpora where one passage can
    * be duplicated across ~10⁶ documents. The cap's effect on the
    * release is MONOTONE SOFTENING, spec-pinned end to end on the
    * planted mega-boilerplate fixture: capped evidence per document is
    * a subset of clique evidence (every star pair is a clique pair),
    * so capped drops ⊆ clique drops and every surviving document keeps
    * at least as many characters; the hot span itself is never missed
    * (the representative pair carries it into every member, so no
    * member escapes its cut) and keep-earliest keeps exactly the
    * representative. What the star can under-score is member-pair
    * sharing AROUND the hot core: below the floor it has no anchors of
    * its own, and a member whose near-complete containment in another
    * member rode exactly that context may soften from drop to cut
    * (the fixture's repdigit family). ≥-floor extra sharing creates
    * its own cold anchors and is always found. */
  def substringRelease(docs: DataFrame, minLen: Int,
      dropPpm: Long = 900000L, cutPpm: Long = 300000L,
      k: Int = 20, maxAnchorDf: Int = 0): DataFrame = {
    require(minLen > k, s"need minLen > k, got ($minLen, $k)")
    val pairs = winnowedSubstringPairs(docs, k = k, w = minLen - k + 1,
        maxAnchorDf = maxAnchorDf)
      .localCheckpoint(true)
    val policy = policyFromCoverage(coverageFromPairs(pairs, docs),
      dropPpm, cutPpm)
    val cut = cutFromPairs(pairs, docs)
    docs.select(col("doc_id"), col("text"))
      .join(policy.select(col("doc_id"), col("action")), Seq("doc_id"), "left")
      .withColumn("action", coalesce(col("action"), lit("keep")))
      .where(col("action") =!= "drop")
      .join(cut.select(col("doc_id"), col("cleaned")), Seq("doc_id"), "left")
      .withColumn("final_text",
        when(col("action") === "cut", col("cleaned")).otherwise(col("text")))
      .select(col("doc_id"), col("action"),
        length(col("final_text")).cast("long").as("final_len"),
        col("final_text"))
  }

  /** [[substringRelease]]'s DuckDB oracle — the policy and cut CTEs
    * composed exactly like the Spark plan. */
  def substringReleaseOracleSql(minLen: Int,
      dropPpm: Long = 900000L, cutPpm: Long = 300000L,
      src: String = "documents"): String = {
    // the cut CTE is concatenated OUTSIDE any stripMargin: its SQL has
    // lines starting with the `||` concat operator, which an enclosing
    // stripMargin would truncate to `|`
    s"WITH pol AS (${substringPolicyOracleSql(minLen, dropPpm, cutPpm, src)}),\n" +
      s"cutq AS (${exactSubstringCutOracleSql(minLen, src)}),\n" +
      s"""act AS (SELECT d.doc_id, d.text, coalesce(p.action, 'keep') AS action
        |        FROM $src d LEFT JOIN pol p USING (doc_id))
        |SELECT a.doc_id, a.action,
        |  CAST(len(CASE WHEN a.action = 'cut' THEN c.cleaned ELSE a.text END)
        |       AS BIGINT) AS final_len,
        |  CASE WHEN a.action = 'cut' THEN c.cleaned ELSE a.text END AS final_text
        |FROM act a LEFT JOIN cutq c USING (doc_id)
        |WHERE a.action <> 'drop'""".stripMargin
  }

  /** TOP DUPLICATED PASSAGES — the corpus-wide boilerplate report (the
    * table Lee et al. publish alongside the dedup): which exact
    * `len`-char windows recur across the most documents. The q196/q198
    * family finds and cuts per-PAIR spans; this rolls the same
    * evidence up corpus-wide — licence headers, navigation chrome,
    * disclaimer paragraphs surface with their document counts.
    *
    * Scale shape (two phases, text never shuffles at corpus size):
    *  1. every window ships only (xxhash64(window), doc_id) — 16
    *     bytes/char, the q196 class; hash groups count distinct docs;
    *  2. windows whose HASH group spans ≥ `minDocs` docs (a text
    *     group can never outnumber its hash group, so this subset
    *     provably contains every qualifying passage — collisions only
    *     ever merge) re-attach their text and re-group by the PASSAGE
    *     BYTES, killing collisions exactly; deterministic top-k by
    *     (n_docs, n_occ, passage).
    *
    * Output: (passage, n_docs, n_occ). Overlapping windows of a longer
    * repeated passage each report — the report grain is the fixed
    * window, the right unit for "how much boilerplate" questions
    * (q198's maximal spans are the removal grain). */
  def topDuplicatedPassages(docs: DataFrame, len: Int = 40,
      minDocs: Int = 2, k: Int = 20): DataFrame = {
    val wins = windowsOf(docs, len)
    val hot = wins
      .select(xxhash64(col("passage")).as("h"), col("doc_id"))
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("hd"))
      .where(col("hd") >= minDocs)
    wins
      .withColumn("h", xxhash64(col("passage")))
      .hint("shuffle_hash") // generate-exploded: Catalyst undershoots it
      .join(hot.select(col("h")).hint("shuffle_hash"), Seq("h"), "left_semi")
      .groupBy(col("passage"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .where(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("passage"))
      .limit(k)
  }

  /** The q211-grain window rollup of `docs` ALONE — (passage, n_docs,
    * n_occ) over every `len`-char window, with NO minDocs filter and
    * no top-k: the per-batch DELTA the maintained boilerplate report
    * appends ([[graft.streaming.StreamIngest.substringIndexBatch]]'s
    * `counts` sidecar). Additivity: when doc sets are DISJOINT across
    * inputs (the stream's replay guard guarantees it), summing these
    * rollups per passage reproduces [[topDuplicatedPassages]]' exact
    * aggregate over the union — per-batch `countDistinct(doc_id)`
    * terms can never double-count a document two batches both hold.
    * One batch-sized window explode + one groupBy; map-side partial
    * aggregation collapses repeated windows before the exchange. */
  def passageCountsOf(docs: DataFrame, len: Int): DataFrame =
    windowsOf(docs, len)
      .groupBy(col("passage"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))

  /** [[passageCountsOf]] at PER-DOCUMENT grain — the maintained
    * sidecar's delta form (round-15): each row carries the doc that
    * contributed it (n_docs ≡ 1), so the row IS its own idempotence
    * witness. A replay after ANY torn append — counts themselves, or
    * the texts guard that determines the fresh set — recomputes
    * bit-identical rows for whatever subset it re-attempts, and the
    * read-side distinct folds them exactly; no counted-docs ledger, no
    * delta-vs-subset divergence. Passage-grain rollups stay exact
    * because docs land in exactly one batch (the texts guard), so
    * sum(n_docs) over distinct per-doc rows == the global
    * countDistinct. Compaction folds these to passage grain
    * (doc_id = null) and the same sum formula covers both shapes. */
  def passageCountsPerDoc(docs: DataFrame, len: Int): DataFrame =
    windowsOf(docs, len)
      .groupBy(col("passage"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"))
      .select(col("passage"), col("doc_id"), lit(1L).as("n_docs"),
        col("n_occ"))

  /** Every `len`-char window of every document as (doc_id, passage) —
    * the ONE window projection [[topDuplicatedPassages]] (the one-shot
    * report) and [[passageCountsOf]] (the maintained sidecar's
    * per-batch delta) both aggregate from: the maintained report's
    * exactness law requires the two window sets to be identical, so
    * they must share this definition rather than re-state it. */
  private def windowsOf(docs: DataFrame, len: Int): DataFrame =
    // widened (r20): the per-character window explode is scan-stage
    // CPU work — one task at fixture scale, no-op on wide inputs
    graft.util.Scale.widen(docs.select(col("doc_id"), col("text")))
      .where(length(col("text")) >= len)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - (len - 1))).as("i"),
        col("text"))
      .select(col("doc_id"), expr(s"substring(text, i, $len)").as("passage"))

  /** [[topDuplicatedPassages]]' DuckDB oracle — the direct one-phase
    * form (group every window by its text): the engine's hash
    * pre-filter is provably lossless, so the two agree exactly. */
  def topDuplicatedPassagesOracleSql(len: Int = 40, minDocs: Int = 2,
      k: Int = 20): String = {
    s"""WITH w AS (SELECT doc_id, substr(text, CAST(i AS INT), $len) AS passage
       |  FROM (SELECT doc_id, text,
       |          unnest(range(1, len(text) - ${len - 1} + 1)) AS i
       |        FROM documents WHERE len(text) >= $len))
       |SELECT passage, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_occ
       |FROM w GROUP BY passage
       |HAVING count(DISTINCT doc_id) >= $minDocs
       |ORDER BY n_docs DESC, n_occ DESC, passage LIMIT $k""".stripMargin
  }

  /** MATCH-LENGTH PROFILE — the measurement that turns the winnow
    * tier's guarantee floor (w + k − 1 = 40 chars for the production
    * k=20/w=21 preset) from a chosen constant into a measured
    * decision: per source (of the later document, the one an edit
    * would touch), how many maximal cross-document matches — and how
    * much character mass — lie BELOW the floor (found by the exact
    * pass, invisible to the winnowed tier's guarantee) vs AT/ABOVE it
    * (guaranteed found). A below-mass near zero says the floor is
    * free; a heavy below-mass argues for a smaller (k, w) — the
    * ScaleProbe `winnow_kw` sweep prices those.
    *
    * Resolution bound, stated: matches shorter than `minLen` (the
    * exact pass's own anchor length) are not measurable at all — this
    * report quantifies [minLen, floorLen) vs [floorLen, ∞), with
    * minLen = k so the unmeasured residue is exactly the sub-k-gram
    * scrap no tier of this family can see.
    *
    * Output: (source, n_below, n_above, chars_below, chars_above,
    * below_mass_ppm) — ppm exact-integer over the total matched mass.
    * Scale shape: the q196 exact pass (the honest corpus-linear price,
    * documented there) + one match-sized join to attach sources + one
    * |sources|-row aggregate. */
  def matchLengthProfile(docs: DataFrame, minLen: Int, floorLen: Int)
      : DataFrame = {
    require(floorLen > minLen, s"need floorLen > minLen, got ($floorLen, $minLen)")
    exactSubstringPairs(docs, minLen)
      .join(docs.select(col("doc_id").as("doc_b"), col("source")), Seq("doc_b"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("match_len") < floorLen, 1L).otherwise(0L)).as("n_below"),
        sum(when(col("match_len") >= floorLen, 1L).otherwise(0L)).as("n_above"),
        sum(when(col("match_len") < floorLen, col("match_len"))
          .otherwise(0L)).cast("long").as("chars_below"),
        sum(when(col("match_len") >= floorLen, col("match_len"))
          .otherwise(0L)).cast("long").as("chars_above"))
      .select(col("source"), col("n_below"), col("n_above"),
        col("chars_below"), col("chars_above"),
        expr("chars_below * 1000000 div (chars_below + chars_above)")
          .as("below_mass_ppm"))
  }

  /** [[matchLengthProfile]]'s DuckDB oracle — the exact pass at
    * `minLen`, source attach, the same partitioned sums. */
  def matchLengthProfileOracleSql(minLen: Int, floorLen: Int): String = {
    s"""WITH pass AS (${exactSubstringOracleSql(minLen)}),
       |j AS (SELECT p.match_len, d.source
       |      FROM pass p JOIN documents d ON d.doc_id = p.doc_b),
       |agg AS (SELECT source,
       |    cast(sum(CASE WHEN match_len < $floorLen THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_below,
       |    cast(sum(CASE WHEN match_len >= $floorLen THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_above,
       |    cast(sum(CASE WHEN match_len < $floorLen THEN match_len
       |             ELSE 0 END) AS BIGINT) AS chars_below,
       |    cast(sum(CASE WHEN match_len >= $floorLen THEN match_len
       |             ELSE 0 END) AS BIGINT) AS chars_above
       |  FROM j GROUP BY source)
       |SELECT source, n_below, n_above, chars_below, chars_above,
       |  chars_below * 1000000 // (chars_below + chars_above)
       |    AS below_mass_ppm
       |FROM agg""".stripMargin
  }

  /** Train→eval contamination at BYTE resolution — the leak check a
    * benchmark owner actually wants: for every val/test document, the
    * exact characters it shares (in maximal spans >= `minLen`) with ANY
    * train document. The n-gram split guard (q135) prevents assigning
    * near-dup CLUSTERS across splits; this measures what still leaks
    * through at substring resolution — quotations, boilerplate, lifted
    * passages — and reports it per contaminated eval document as
    * (doc_id, split, max_match_len, leaked_chars, len, leak_ppm).
    * Clean eval documents are not re-emitted (the q198 affected-only
    * discipline).
    *
    * Splits are the deterministic q51 hash buckets (salt "split",
    * 80/10/10) computed INLINE as a pure expression of doc_id — the
    * pair relation never joins a corpus-sized split table. Pairs come
    * from the winnowed tier ([[winnowedSubstringPairs]], recall proven
    * complete at >= minLen); spans union per eval document with the
    * shared interval merge. */
  def substringLeak(docs: DataFrame, minLen: Int, k: Int = 20)
      : DataFrame = {
    require(minLen > k, s"need minLen > k, got ($minLen, $k)")
    def splitOf(id: Column): Column = {
      val b = Sampling.bucket(docs, id, "split")
      when(b < 80, "train").when(b < 90, "val").otherwise("test")
    }
    val pairs = winnowedSubstringPairs(docs, k = k, w = minLen - k + 1)
      .withColumn("split_a", splitOf(col("doc_a")))
      .withColumn("split_b", splitOf(col("doc_b")))
    val evalSpans = pairs
      .where(col("split_a") === "train" && col("split_b") =!= "train")
      .select(col("doc_b").as("doc_id"), col("pos_b").cast("long").as("s"),
        (col("pos_b") + col("match_len") - 1).as("e"), col("match_len"))
      .unionByName(pairs
        .where(col("split_b") === "train" && col("split_a") =!= "train")
        .select(col("doc_a").as("doc_id"), col("pos_a").cast("long").as("s"),
          (col("pos_a") + col("match_len") - 1).as("e"), col("match_len")))
    evalSpans
      .groupBy("doc_id")
      .agg(sort_array(collect_set(struct(col("s"), col("e")))).as("spans"),
        max(col("match_len")).as("max_match_len"))
      .withColumn("merged", mergedIntervals)
      .select(col("doc_id"), col("max_match_len"),
        expr("aggregate(merged, CAST(0 AS BIGINT), (a, m) -> a + m.e - m.s + 1)")
          .as("leaked_chars"))
      .join(docs.select(col("doc_id"),
        length(col("text")).cast("long").as("len")), Seq("doc_id"))
      .select(col("doc_id"), splitOf(col("doc_id")).as("split"),
        col("max_match_len"), col("leaked_chars"), col("len"),
        expr("leaked_chars * 1000000 div len").as("leak_ppm"))
  }

  /** [[substringLeak]]'s DuckDB oracle — the exact pass, hash-bucket
    * splits, train→eval span orientation (both pair directions),
    * gaps-and-islands union, integer ppm. */
  def substringLeakOracleSql(minLen: Int): String = {
    def splitSql(idExpr: String): String =
      s"""CASE WHEN ${Sampling.bucketSql(idExpr, "split")} < 80 THEN 'train'
         |     WHEN ${Sampling.bucketSql(idExpr, "split")} < 90 THEN 'val'
         |     ELSE 'test' END""".stripMargin
    s"""WITH pass AS (${exactSubstringOracleSql(minLen)}),
       |lab AS (SELECT doc_a, doc_b, pos_a, pos_b, match_len,
       |          ${splitSql("doc_a")} AS split_a,
       |          ${splitSql("doc_b")} AS split_b
       |        FROM pass),
       |sp AS (SELECT doc_b AS doc_id, pos_b AS s,
       |              pos_b + match_len - 1 AS e, match_len
       |       FROM lab WHERE split_a = 'train' AND split_b <> 'train'
       |       UNION ALL
       |       SELECT doc_a, pos_a, pos_a + match_len - 1, match_len
       |       FROM lab WHERE split_b = 'train' AND split_a <> 'train'),
       |spd AS (SELECT DISTINCT doc_id, s, e FROM sp),
       |m1 AS (SELECT doc_id, s, e,
       |         max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |           AS prev_e
       |       FROM spd),
       |m2 AS (SELECT doc_id, s, e,
       |         sum(CASE WHEN prev_e IS NULL OR s > prev_e + 1
       |                  THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY s, e) AS isl
       |       FROM m1),
       |mg AS (SELECT doc_id, isl, min(s) AS s, max(e) AS e
       |       FROM m2 GROUP BY 1, 2),
       |lk AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS leaked_chars
       |       FROM mg GROUP BY 1),
       |mm AS (SELECT doc_id, max(match_len) AS max_match_len
       |       FROM sp GROUP BY 1)
       |SELECT l.doc_id, ${splitSql("l.doc_id")} AS split,
       |  m.max_match_len, l.leaked_chars,
       |  CAST(len(d.text) AS BIGINT) AS len,
       |  l.leaked_chars * 1000000 // CAST(len(d.text) AS BIGINT) AS leak_ppm
       |FROM lk l JOIN mm m USING (doc_id) JOIN documents d USING (doc_id)""".stripMargin
  }

  /** Quality-distribution DRIFT monitor — the report a production
    * pipeline runs when a new crawl snapshot (here: each `source`)
    * lands: per source, the histogram of an exact-integer quality
    * signal (stopword-density ppm, [[qualityScore]]'s ratio kept in
    * integer arithmetic, fixed-width deciles) side by side with the
    * corpus-wide histogram, plus the total-variation distance between
    * the two in ppm. TVD instead of PSI/KL keeps the whole report in
    * exact integers (no engine-divergent `ln`), and is the standard
    * drift statistic when distributions may have empty buckets.
    *
    * Output: one row per (source, corpus-occupied bucket) — DENSE, so
    * a bucket the source misses entirely still contributes its corpus
    * mass to the TVD — with (cnt, src_ppm, corpus_ppm, tvd_ppm);
    * tvd_ppm repeats per source (window sum over a ≤10-row group).
    *
    * Scale shape: ONE corpus scan into groupBy(source, bucket); the
    * dense lattice is built from that single aggregate by windows +
    * a map explode (never by re-referencing the scan — a naive
    * three-branch join compiles to three corpus scans), so every
    * operator after the first exchange runs on the (sources × ≤10
    * buckets)-sized relation. The partition-free windows are fine
    * here for exactly that reason: they move metadata, not corpus. */
  def qualityDrift(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("long")
    val nStop = Stopwords
      .map(w => size(filter(toks, t => t === w)).cast("long")).reduce(_ + _)
    val scored = docs
      .select(col("source"), nStop.as("n_stop"), nTok.as("n_tok"))
      .select(col("source"),
        least(expr("n_stop * 1000000 div n_tok div 100000"), lit(9L))
          .as("bucket"))
    val sb = scored.groupBy("source", "bucket").agg(count(lit(1)).as("cnt"))
    val enriched = sb
      .withColumn("ccnt", sum(col("cnt")).over(Window.partitionBy("bucket")))
      .withColumn("ctot", sum(col("cnt")).over(Window.partitionBy()))
      .withColumn("allm", map_from_entries(array_distinct(
        collect_list(struct(col("bucket"), col("ccnt")))
          .over(Window.partitionBy()))))
    val perSrc = enriched.groupBy("source")
      .agg(first(col("ctot")).as("ctot"), first(col("allm")).as("allm"),
        sum(col("cnt")).as("tot"),
        map_from_entries(collect_list(struct(col("bucket"), col("cnt"))))
          .as("mine"))
    perSrc
      .select(col("source"), col("tot"), col("ctot"), col("mine"),
        explode(col("allm")).as(Seq("bucket", "ccnt")))
      .withColumn("cnt", coalesce(expr("mine[bucket]"), lit(0L)))
      .select(col("source"), col("bucket"), col("cnt"),
        expr("cnt * 1000000 div tot").as("src_ppm"),
        expr("ccnt * 1000000 div ctot").as("corpus_ppm"))
      .withColumn("tvd_ppm",
        expr("sum(abs(src_ppm - corpus_ppm)) over (partition by source) div 2"))
  }

  /** [[qualityDrift]]'s DuckDB oracle — identical bucketing, dense
    * source×bucket lattice, integer `//` ppm, window TVD. */
  def qualityDriftOracleSql: String = {
    val nStopSql = Stopwords
      .map(w => s"len(list_filter(t, x -> x = '$w'))").mkString(" + ")
    s"""WITH q AS (SELECT source,
       |    least(($nStopSql) * 1000000 // len(t) // 100000, 9) AS bucket
       |  FROM (SELECT source, string_split(text, ' ') AS t FROM documents)),
       |sb AS (SELECT source, bucket, count(*) AS cnt FROM q GROUP BY 1, 2),
       |st AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS tot
       |       FROM sb GROUP BY 1),
       |cb AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS ccnt
       |       FROM sb GROUP BY 1),
       |ct AS (SELECT CAST(sum(cnt) AS BIGINT) AS ctot FROM sb),
       |dense AS (SELECT s.source, b.bucket,
       |            CAST(coalesce(x.cnt, 0) AS BIGINT) AS cnt,
       |            s.tot, b.ccnt, t.ctot
       |          FROM st s CROSS JOIN cb b CROSS JOIN ct t
       |          LEFT JOIN sb x ON x.source = s.source AND x.bucket = b.bucket),
       |pp AS (SELECT source, bucket, cnt,
       |         CAST(cnt * 1000000 // tot AS BIGINT) AS src_ppm,
       |         CAST(ccnt * 1000000 // ctot AS BIGINT) AS corpus_ppm
       |       FROM dense)
       |SELECT source, bucket, cnt, src_ppm, corpus_ppm,
       |  CAST(sum(abs(src_ppm - corpus_ppm))
       |         OVER (PARTITION BY source) // 2 AS BIGINT) AS tvd_ppm
       |FROM pp""".stripMargin
  }

  /** Intra-document repetition score (the Gopher-style quality filter):
    * fraction of the document's word n-grams occupied by its single most
    * repeated n-gram. Grams are counted with multiplicity — a document
    * that loops one phrase scores near 1.
    *
    * Pure projection, ZERO shuffles: the max gram count never leaves
    * the row — one pass of the codegen'd
    * [[graft.functions.TopGramRun]] kernel per document. (The grouped
    * formulation — groupBy(doc, gram) then groupBy(doc) — shuffles one
    * row per distinct gram of the corpus; and the pre-r20 declarative
    * form — sort_array over materialized gram strings + an `aggregate`
    * longest-equal-run fold — ran interpreted per row because Spark's
    * higher-order functions are CodegenFallback; the kernel computes
    * the identical number, see its scaladoc.)
    */
  def repetitionScore(docs: DataFrame, n: Int = 2): DataFrame = {
    graft.functions.TopGramRun.register(docs.sparkSession)
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"),
        (size(col("toks")) - (n - 1)).cast("long").as("n_grams"),
        call_function("top_gram_run", col("toks"), lit(n)).as("top_rep"))
      .select(col("doc_id"), col("n_grams"), col("top_rep"),
        (col("top_rep").cast("double") / col("n_grams")).as("rep_ratio"))
  }

  /** PII patterns: (name, regex, replacement token). Regexes restrict to
    * syntax with identical semantics in Java regex and RE2 (so the
    * DuckDB oracle behaves the same): character classes, bounded
    * repetition, ASCII word boundary. Scrub order is list order: each
    * pattern runs over the previous pattern's output, so an earlier
    * redaction can consume text a later pattern would have matched.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+\\d{7,15}", "<PHONE>"))

  /** PII redaction (pre-training scrub): replaces email / IPv4 / intl
    * phone patterns with typed placeholder tokens and reports per-kind
    * match counts (counted on the ORIGINAL text, each pattern
    * independently — the audit number, not the replacement number).
    * Pure projection, zero shuffles; regexes evaluate inside codegen.
    */
  def scrubPii(docs: DataFrame, text: Column = col("text")): DataFrame = {
    val counts = PiiPatterns.map { case (name, re, _) =>
      regexp_count(text, lit(re)).cast("long").as(s"n_$name") }
    val cleaned = PiiPatterns.foldLeft(text) { case (t, (_, re, tok)) =>
      regexp_replace(t, re, tok) }
    docs.select(col("doc_id") +: counts :+ cleaned.as("clean_text"): _*)
  }

  /** Overlapping fixed-size token-window chunking (context-window
    * splitting for embedding / training): chunk c starts at token
    * offset c·stride (0-based chunk ids), covers `chunkSize` tokens,
    * and the final chunk is truncated at the document end. Every token
    * position belongs to ≥ 1 chunk; consecutive chunks overlap by
    * chunkSize − stride tokens.
    *
    * Pure per-row explode (narrow, zero shuffles): a doc's chunks are
    * computed from its own token array. Output order/ids deterministic.
    */
  def chunk(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize)
    val toks = split(col("text"), " ")
    docs
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), col("t"),
        posexplode(sequence(lit(1), size(col("t")), lit(stride))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        array_join(slice(col("t"), col("col"), lit(chunkSize)), " ").as("chunk_text"),
        least(lit(chunkSize), size(col("t")) - col("col") + 1)
          .cast("long").as("chunk_tok"))
  }

  /** ALL per-row cleaning signals in ONE corpus scan: language guess,
    * token count, and the repetition stats — each identical to its
    * standalone operator ([[langId]], [[qualityScore]]'s token count,
    * [[repetitionScore]]), but computed in a single projection. The
    * standalone operators semi-joined together scan the corpus once PER
    * PREDICATE (Catalyst cannot fuse projections across joins); at
    * 100 TB the quality-filter pass must read each document exactly
    * once, which is this shape. Docs with fewer than `repN` tokens get
    * n_grams = 0 and a null rep_ratio (the standalone repetition
    * operator drops them instead).
    *
    * `extras` appends additional per-row signal columns (e.g. PII match
    * counts) to the SAME scan — the mechanism `Prep.filterFunnel` uses
    * to keep the whole gate single-pass.
    */
  def cleanSignals(docs: DataFrame, repN: Int = 2,
                   extras: Seq[Column] = Nil): DataFrame = {
    graft.functions.TopGramRun.register(docs.sparkSession)
    // top_rep via the codegen'd TopGramRun kernel (identical number to
    // the pre-r20 sorted-gram fold — see the kernel scaladoc; the gram
    // ARRAY is never materialized). n_grams is the same arithmetic the
    // gram array's size obeyed: size(toks) - repN + 1 when size >= repN
    // (0 otherwise, including null text — size(null) is null, so the
    // `when` falls through exactly as the old array() branch did).
    val withToks = docs
      .select(col("doc_id"), col("lang"), col("text"),
        split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("lang"), col("text"), col("toks"),
        when(size(col("toks")) >= repN,
          size(col("toks")) - (repN - 1)).otherwise(lit(0))
          .cast("long").as("n_grams"),
        when(size(col("toks")) >= repN,
          call_function("top_gram_run", col("toks"), lit(repN)))
          .otherwise(lit(0L)).as("top_rep"))
    withToks.select(Seq(
      col("doc_id"), col("lang"),
      langGuessExpr(col("text")).as("lang_guess"),
      size(col("toks")).cast("long").as("n_tokens"),
      col("n_grams"),
      col("top_rep"),
      when(col("n_grams") > 0,
        col("top_rep").cast("double") / col("n_grams")).as("rep_ratio")) ++ extras: _*)
  }

  /** Inverse of [[chunk]] for non-overlapping chunks (stride ==
    * chunkSize): reassembles each document's chunks in chunk_id order —
    * the "stitch model outputs back into documents" step. One hash
    * aggregate; per-group state is the document's own chunk list.
    * Roundtrip law (tested + oracle-verified):
    * reassemble(chunk(docs, s, s)) == docs.
    */
  def reassemble(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("doc_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          s => s.getField("chunk_text")), " ").as("text"))

  /** Canonical text normalization for dedup keys (the step every
    * production dedup runs BEFORE hashing — raw hashing misses
    * case/punctuation variants of identical content): lowercase,
    * non-alphanumerics → space, whitespace squeeze, trim. Pure
    * projection, zero shuffles; regex classes are chosen for identical
    * Java/RE2 semantics (the PiiPatterns discipline). ASCII contract:
    * Unicode canonicalization (NFC, case folding beyond ASCII) is an
    * ICU concern deliberately out of scope — documented, not silent.
    */
  def normalizeTextCol(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** [[normalizeTextCol]] in DuckDB SQL (oracle twin — same regexes,
    * global flag). */
  def normalizeTextSql(e: String): String =
    s"trim(regexp_replace(regexp_replace(lower($e), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** MULTILINGUAL normalization key: Unicode NFC + casefold + space
    * squeeze — [[normalizeTextCol]] without the ASCII alphabet strip
    * (which would delete every non-Latin script outright). NFC first
    * ([[graft.functions.NfcNormalize]], codegen'd, ASCII fast path):
    * crawls deliver `é` both composed (U+00E9) and decomposed
    * (`e`+U+0301) and the two spellings hash apart, so multilingual
    * dedup keys MUST compose before hashing.
    *
    * Casefold is the Unicode SIMPLE MAPPING
    * ([[graft.functions.SimpleLower]], codegen'd) — NOT Spark's
    * `lower()`: Java's String.toLowerCase applies full SpecialCasing
    * (Turkish İ → i+U+0307, position-aware Greek final sigma) while
    * DuckDB's utf8proc applies the simple map, so a `lower()` key
    * hashes apart across the engines the moment a crawl delivers
    * Turkish or Greek capitals — the round-10 documented descope. The
    * simple map is what BOTH engines implement identically (İ → i,
    * Σ → σ everywhere), so the descope is closed by construction
    * (q209 injects exactly those cases and oracle-proves the keys);
    * the remaining contract is stated on the kernel's scaladoc:
    * locale-TAILORED folding is a non-goal of a locale-independent
    * key, and ς-form vs σ-form lowercase Greek stay distinct keys —
    * consistently in both engines. Self-registers
    * [[graft.functions.NfcNormalize]] and
    * [[graft.functions.SimpleLower]] on the active session.
    * Idempotent: NFC∘NFC = NFC and the simple map is the identity on
    * its own image (law spec-pinned). */
  def normalizeTextUnicodeCol(text: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.functions.NfcNormalize.register(spark)
    graft.functions.SimpleLower.register(spark)
    trim(regexp_replace(
      call_function("simple_lower", call_function("graft_nfc", text)),
      " +", " "))
  }

  /** [[normalizeTextUnicodeCol]] in DuckDB SQL (oracle twin —
    * `nfc_normalize` is DuckDB's Unicode canonical composition, and
    * DuckDB's `lower()` is the utf8proc SIMPLE mapping, i.e. exactly
    * what the engine's SimpleLower kernel computes). */
  def normalizeTextUnicodeSql(e: String): String =
    s"trim(regexp_replace(lower(nfc_normalize($e)), ' +', ' ', 'g'))"

  /** Known tracking query parameters stripped by [[canonicalUrlCol]] —
    * an alternation of exact param NAMES (each match is anchored by a
    * preceding `?`/`&` and a following `=`, so `said`/`sident` never
    * false-match `sid`). The SAME constant builds the engine and
    * oracle regexes. */
  val TrackingParams: String = "utm_[a-z0-9_]*|fbclid|gclid|sid"

  /** Canonical URL normalization (the dedup key for crawl corpora —
    * the same page is fetched under tracking-query / fragment / www /
    * trailing-slash variants, and raw-URL dedup misses all of them):
    * lowercase, strip the fragment, strip KNOWN TRACKING query params
    * ([[TrackingParams]]: utm_*, fbclid, gclid, sid) — content-
    * addressing params (`?page=2`, `?id=…`) are kept, because folding
    * the whole query string would merge genuinely distinct pages and
    * first-wins dedup would then delete real content — fold the
    * `www.` host prefix, strip one trailing slash (also the slash
    * directly before a surviving query). Pure projection, zero
    * shuffles; patterns use the Java/RE2-identical subset (the
    * normalizeTextCol discipline; the replacement backreference is
    * `$1` in Java, `\\1` in RE2 — syntax differs, semantics agree).
    * RFC 3986 folds covered: percent-decoding of UNRESERVED octets
    * (§2.3, via the codegen'd [[graft.functions.PctDecodeUnreserved]]
    * — reserved escapes like `%2f` survive, decoding them would merge
    * distinct paths; decoding runs FIRST so `%2e` participates in the
    * dot-segment fold exactly as the RFC requires), default-port strip
    * (`:80` for http / `:443` for https, §3.2.3), and dot-segment
    * removal via the SAME [[foldDotSegments]] chain [[resolveUrlCol]]
    * uses (RFC-exact segment class, [[DotSegmentDepth]] nesting levels
    * per call — stacked `a/b/../../c` fully resolves; the round-10
    * two-folds-that-can-disagree split is gone, and the agreement law
    * canonicalize(url) == canonicalize(resolve(base, ref)) on the same
    * merged string is spec-pinned), and userinfo fold (§3.2.1 —
    * `user:pass@host` names the same resource as `host`, so the
    * userinfo strips from the dedup key; an '@' in path/query never
    * matches by char-class construction). IDN host normalization is
    * the separate opt-in [[idnHostToAsciiCol]] pass applied BEFORE
    * this fold (DuckDB has no punycode, so that fold is table-driven-
    * verified via [[IdnFixtures]]/q210 rather than
    * expression-replayed). The `www.` fold
    * still applies ONCE per call: a pathological `www.www.` host loses
    * one `www.` per application (idempotence holds for well-formed
    * URLs, spec-pinned, not for stacked prefixes — documented, not
    * silent). Self-registers
    * [[graft.functions.PctDecodeUnreserved]] on the active session.
    */
  /** (unicode host label, its RFC 3490 punycode ToASCII form) — the
    * ground-truth table behind the IDN fold's verification: q210
    * synthesizes hosts from the LEFT column, its oracle replays the
    * RIGHT column as literals, and the driver hash gate therefore
    * proves `java.net.IDN.toASCII` reproduces every recorded form
    * (DuckDB has no punycode function, so the fold is table-driven-
    * verifiable, not expression-replayable — the q195 discipline). */
  val IdnFixtures: Seq[(String, String)] = Seq(
    ("bücher", "xn--bcher-kva"), ("münchen", "xn--mnchen-3ya"),
    ("köln", "xn--kln-sna"), ("日本", "xn--wgv71a"),
    ("ελλάδα", "xn--hxakic4aa"), ("россия", "xn--h1alffa9f"),
    ("çağrı", "xn--ar-3ia9t9c"))

  /** The IDN host fold as a Column — apply BEFORE [[canonicalUrlCol]]
    * (see [[graft.functions.IdnHostAscii]] for parsing and
    * error-passthrough contracts). Self-registers the kernel. */
  def idnHostToAsciiCol(url: Column): Column = {
    graft.functions.IdnHostAscii.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("idn_host_ascii", url)
  }

  def canonicalUrlCol(url: Column): Column = {
    graft.functions.PctDecodeUnreserved.register(
      org.apache.spark.sql.SparkSession.active)
    val noFrag = regexp_replace(lower(url), "#.*$", "")
    // userinfo fold (§3.2.1): `user:pass@` before the host names the
    // same resource — strip it from the dedup key. The char class
    // excludes /?#, so an '@' inside path/query/fragment can never
    // match; '@' itself is excluded so a (grammar-invalid) double
    // userinfo loses one layer per call, the www. discipline. Runs
    // BEFORE the %-decode: '@' is reserved, so an escaped %40 never
    // assembles a new userinfo boundary
    val noUser = regexp_replace(noFrag,
      "^([a-z][a-z0-9+.-]*://)[^/?#@]*@", "$1")
    // unreserved %-escapes decode before any structural fold (so %2e
    // joins dot-segments, %70 joins the path text) — reserved escapes
    // survive by construction of the expression
    val decoded = call_function("graft_pct_decode", noUser)
    // tracking params drop to their leading separator; separator runs
    // then collapse and dangling ?/& trim away
    val noTrack = regexp_replace(decoded, s"([?&])($TrackingParams)=[^&]*", "$1")
    val cleanSep = regexp_replace(regexp_replace(regexp_replace(
      noTrack, "&+", "&"), "\\?&", "?"), "[?&]$", "")
    // dot-segments: the SAME depth-8 RFC-exact chain resolveUrlCol
    // uses ([[foldDotSegments]]) — the two entry points cannot
    // disagree on stacked `..` or exotic segments
    val dotSeg = foldDotSegments(cleanSep)
    // default ports: only when the port ends the authority
    val noPort = regexp_replace(regexp_replace(dotSeg,
      "^(http://[^/?:]+):80([/?]|$)", "$1$2"),
      "^(https://[^/?:]+):443([/?]|$)", "$1$2")
    regexp_replace(regexp_replace(regexp_replace(
      noPort, "/\\?", "?"), "://www\\.", "://"), "/$", "")
  }

  /** [[canonicalUrlCol]] in DuckDB SQL (oracle twin — same regexes in
    * the same order; `g` flag matches Spark's replace-all default). */
  /** The unreserved-octet decode table (RFC 3986 §2.3) shared by the
    * engine expression's scaladoc contract and the generated oracle
    * chain: lowercase-hex escape → decoded char, letters folding to
    * lowercase (the canonical key is lowercase; `lower()` runs before
    * the decode on both engines, so only lowercase-hex forms arrive). */
  private[graft] val UnreservedDecodes: Seq[(String, String)] = {
    val selfCase = (('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~'))
      .map(c => f"%%${c.toInt}%02x" -> c.toString)
    val upperToLower = ('A' to 'Z').map(c => f"%%${c.toInt}%02x" -> c.toLower.toString)
    selfCase ++ upperToLower
  }

  def canonicalUrlSql(e: String): String = {
    val noFrag = s"regexp_replace(lower($e), '#.*$$', '', 'g')"
    val noUser = s"regexp_replace($noFrag, " +
      s"'^([a-z][a-z0-9+.-]*://)[^/?#@]*@', '\\1', 'g')"
    // unreserved %-escape decode: a replace() per code, generated from
    // the shared table. Pass-per-code equals the engine's single scan
    // except on self-referential encodings (see PctDecodeUnreserved
    // scaladoc) — absent from every injection.
    val decoded = UnreservedDecodes.foldLeft(noUser) { case (acc, (code, ch)) =>
      val lit = if (ch == "'") "''" else ch
      s"replace($acc, '$code', '$lit')"
    }
    val noTrack =
      s"regexp_replace($decoded, '([?&])($TrackingParams)=[^&]*', '\\1', 'g')"
    val cleanSep = s"regexp_replace(regexp_replace(regexp_replace(" +
      s"$noTrack, '&+', '&', 'g'), '\\?&', '?', 'g'), '[?&]$$', '', 'g')"
    val dotSeg = foldDotSegmentsSql(cleanSep)
    val noPort = s"regexp_replace(regexp_replace($dotSeg, " +
      s"'^(http://[^/?:]+):80([/?]|$$)', '\\1\\2', 'g'), " +
      s"'^(https://[^/?:]+):443([/?]|$$)', '\\1\\2', 'g')"
    s"regexp_replace(regexp_replace(regexp_replace(" +
      s"$noPort, '/\\?', '?', 'g'), '://www\\.', '://', 'g'), '/$$', '', 'g')"
  }

  /** The dot-segment fold chain shared by [[canonicalUrlCol]],
    * [[resolveUrlCol]], and their oracle twins — now a re-export of
    * [[graft.functions.DotSegmentFold.Folds]], the single source of
    * truth the engine KERNEL and the oracle's generated
    * regexp_replace chain both derive from. (java-syntax pattern,
    * `$n`-syntax replacement), applied in order, [[DotSegmentDepth]]
    * times. Every construct is Java/RE2-identical; the oracle
    * translates `$n` → `\\n`. Pattern-order rationale lives on the
    * kernel's scaladoc.
    *
    * The SEG class is RFC-exact: any path segment that is neither `.`
    * nor `..` (so `...` IS a poppable segment). One application folds
    * one NESTING level (Java and RE2 both resume scanning after a
    * replacement, so `/a/../b/../c` needs two passes);
    * [[DotSegmentDepth]] applications resolve any stack a real crawl
    * emits, and deeper residue survives visibly rather than
    * corrupting. */
  private[graft] def DotSegmentFolds: Seq[(String, String)] =
    graft.functions.DotSegmentFold.Folds
  private[graft] def DotSegmentDepth: Int = graft.functions.DotSegmentFold.Depth

  /** The ONE dot-segment normalizer both URL entry points share
    * (round-10 verdict: two folds that can disagree on the same input
    * are a defect class, not a feature): [[DotSegmentFolds]] applied
    * [[DotSegmentDepth]] times — RFC-exact segment class, any nesting
    * a real crawl emits resolved, deeper residue surviving visibly.
    * [[canonicalUrlCol]] and [[resolveUrlCol]] both route here, so
    * canonicalize(url) and canonicalize(resolve(base, ref)) can never
    * derive different dot-segment answers for the same merged string
    * (agreement law spec-pinned in ExtSpec).
    *
    * Engine side this is the codegen'd
    * [[graft.functions.DotSegmentFold]] KERNEL, not 40 chained
    * regexp_replace: the declarative chain measured ~2× on the URL
    * query family (q158 0.28→0.59 s etc. at sf0.1), while the kernel's
    * `indexOf("/.")` fast path makes the dot-free majority of URLs
    * one byte-scan — kernel-vs-chain equality is spec-pinned on the
    * adversarial case table. */
  private def foldDotSegments(u: Column): Column = {
    graft.functions.DotSegmentFold.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("dot_segment_fold", u)
  }

  /** [[foldDotSegments]]' DuckDB twin, generated from the same
    * constants (`$n` → `\n` replacement syntax is the only dialect
    * difference). */
  private def foldDotSegmentsSql(e: String): String =
    (1 to DotSegmentDepth).foldLeft(e) { (u, _) =>
      DotSegmentFolds.foldLeft(u) { case (c, (p, r)) =>
        val sqlPat = p.replace("'", "''")
        val sqlRep = r.replace("$", "\\")
        s"regexp_replace($c, '$sqlPat', '$sqlRep', 'g')"
      }
    }

  /** RFC 3986 §5 reference resolution — the crawl-pipeline transform
    * between HTML extraction and URL dedup: every href a page links is
    * resolved against the page's own URL before canonicalization, or
    * the link graph fragments into relative-path noise.
    *
    * Case chain (§5.2.2, merge-paths §5.2.3): absolute refs (any
    * scheme, `mailto:` included) pass through; `//host/...` inherits
    * the base scheme; `/path` replaces the base path; `?q` replaces
    * the base query; `#frag` and the empty ref are same-document
    * (base, fragment dropped); anything else joins the base
    * DIRECTORY. The merged string then folds dot-segments with the
    * RFC-exact segment class, [[DotSegmentDepth]] nesting levels per
    * call ([[DotSegmentFolds]]) — `../../css/x.css` against a
    * two-deep page lands where a browser lands it.
    *
    * Contract bounds (documented, not silent): the base must be an
    * absolute `scheme://host` URL (a crawl frontier always is);
    * userinfo and IDN hosts pass through unfolded (the
    * canonicalUrlCol descope); dot-segment-SHAPED text inside a query
    * string folds too (the q158 whole-string discipline); trailing
    * `/.`/`/..` leave a trailing slash exactly as the RFC does —
    * [[canonicalUrlCol]] downstream strips it from the dedup key.
    * Pure projection, zero shuffles, zero UDFs. */
  def resolveUrlCol(base: Column, ref: Column): Column = {
    val scheme = regexp_extract(base, "^([a-z][a-z0-9+.-]*):", 1)
    val origin = regexp_extract(base, "^([a-z][a-z0-9+.-]*://[^/?#]*)", 1)
    val noQF = regexp_replace(base, "[?#].*$", "")
    val noF = regexp_replace(base, "#.*$", "")
    val dir0 = regexp_replace(noQF, "[^/]*$", "")
    // authority-only base ("http://h"): the regex would strip into the
    // authority — the directory is the root
    val dir = when(dir0.rlike("^[a-z][a-z0-9+.-]*://[^/?#]*/"), dir0)
      .otherwise(concat(origin, lit("/")))
    val merged = when(ref.rlike("^[a-z][a-z0-9+.-]*:"), ref)
      .when(ref.startsWith("//"), concat(scheme, lit(":"), ref))
      .when(ref.startsWith("/"), concat(origin, ref))
      .when(ref.startsWith("?"), concat(noQF, ref))
      .when(ref.startsWith("#"), concat(noF, ref))
      .when(ref === "", noF)
      .otherwise(concat(dir, ref))
    foldDotSegments(merged)
  }

  /** [[resolveUrlCol]] in DuckDB SQL — same case chain, same fold
    * chain, generated from the same constants. */
  def resolveUrlSql(baseE: String, refE: String): String = {
    val scheme = s"regexp_extract($baseE, '^([a-z][a-z0-9+.-]*):', 1)"
    val origin = s"regexp_extract($baseE, '^([a-z][a-z0-9+.-]*://[^/?#]*)', 1)"
    val noQF = s"regexp_replace($baseE, '[?#].*$$', '', 'g')"
    val noF = s"regexp_replace($baseE, '#.*$$', '', 'g')"
    val dir0 = s"regexp_replace($noQF, '[^/]*$$', '', 'g')"
    val dir = s"(CASE WHEN regexp_matches($dir0, " +
      s"'^[a-z][a-z0-9+.-]*://[^/?#]*/') THEN $dir0 " +
      s"ELSE $origin || '/' END)"
    val merged =
      s"""(CASE
         |  WHEN regexp_matches($refE, '^[a-z][a-z0-9+.-]*:') THEN $refE
         |  WHEN $refE LIKE '//%' THEN $scheme || ':' || $refE
         |  WHEN $refE LIKE '/%' THEN $origin || $refE
         |  WHEN $refE LIKE '?%' THEN $noQF || $refE
         |  WHEN $refE LIKE '#%' THEN $noF || $refE
         |  WHEN $refE = '' THEN $noF
         |  ELSE $dir || $refE END)""".stripMargin
    foldDotSegmentsSql(merged)
  }

  /** Main-text extraction from raw HTML (the first transform of every
    * web-crawl pipeline): drop `<script>`/`<style>` subtrees
    * WITH their contents (tag-stripping alone would leak JavaScript
    * and CSS into the corpus), strip remaining tags, decode the five
    * XML entities, squeeze whitespace. `(?s)` makes the subtree
    * patterns span newlines; non-greedy `.*?` stops at the FIRST
    * closing tag so adjacent scripts don't merge into one span. Both
    * flags/constructs are Java/RE2-identical. `&amp;` decodes LAST —
    * the standard order, so `&amp;lt;` yields the literal `&lt;` the
    * author escaped, not `<`. Entities beyond the XML five (`&copy;`
    * etc.) pass through undecoded — documented contract, not silence.
    * Pure projection, zero shuffles.
    */
  def htmlExtractCol(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(html,
      "(?s)<script.*?</script>", " "), "(?s)<style.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&").foldLeft(noTags) {
      case (c, (ent, ch)) => regexp_replace(c, ent, ch)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** [[htmlExtractCol]] in DuckDB SQL (oracle twin — same patterns,
    * same entity order). */
  def htmlExtractSql(e: String): String = {
    val noBlocks = s"regexp_replace(regexp_replace($e, " +
      "'(?s)<script.*?</script>', ' ', 'g'), '(?s)<style.*?</style>', ' ', 'g')"
    val noTags = s"regexp_replace($noBlocks, '<[^>]*>', ' ', 'g')"
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&amp;" -> "&").foldLeft(noTags) {
      case (c, (ent, ch)) => s"regexp_replace($c, '$ent', '$ch', 'g')"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  /** Corpus-wide top-k word n-grams with occurrence counts (WIMBD-class
    * corpus analytics — "what is in this corpus"). Counted with
    * multiplicity; the (count DESC, gram-bytes ASC) total order makes
    * the cutoff deterministic, and gram ordering compares UTF-8 BYTES
    * (binary cast) so the DuckDB oracle's native collation agrees on
    * non-ASCII vocabularies (the bpeVocab collation discipline).
    *
    * Scale shape: one partial-aggregated count exchange on the gram
    * key, then TakeOrderedAndProject — each partition keeps its own
    * top-k, so the gram relation never globally sorts.
    */
  def topNgrams(docs: DataFrame, n: Int, k: Int): DataFrame = {
    require(n > 0 && k > 0)
    docs
      .select(split(col("text"), " ").as("t"))
      .where(size(col("t")) >= n)
      .select(explode(transform(sequence(lit(0), size(col("t")) - n),
        i => array_join(slice(col("t"), i + 1, lit(n)), " "))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("gram").cast("binary"))
      .limit(k)
  }

  /** Per-document n-gram NOVELTY against everything earlier in corpus
    * order (WIMBD-class diversity analytics): for each document, the
    * share of its distinct word n-grams whose FIRST corpus occurrence
    * (minimum doc_id over containing docs) is this document — a corpus
    * accumulating near-duplicates or template text shows novelty
    * decaying toward zero in id order, fresh content holds near 10⁶
    * ppm. Complements [[boilerplateScore]] (which is order-agnostic:
    * any cross-doc gram counts against BOTH docs; here the first
    * holder keeps credit).
    *
    * Scale shape: grams travel as 64-bit hashes (the
    * [[boilerplateScore]] discipline — collisions merge identically on
    * both engines, no drift); one gram-keyed partial aggregate for the
    * firsts, one gram-keyed equi-join back, one per-doc rollup. Exact
    * integer ppm.
    */
  def ngramNovelty(docs: DataFrame, n: Int): DataFrame = {
    graft.functions.Md5Prefix64.register(docs.sparkSession)
    // DISTINCT runs on the HASHED (doc_id, gh) relation, matching the
    // oracle's SELECT DISTINCT doc_id, gh — shingleIndex's text-level
    // array_distinct alone would count an intra-document 60-bit hash
    // collision as two grams where the oracle merges them into one.
    val hashed = Dedup.shingleIndex(docs, n)
      .select(col("doc_id"), Dedup.hash64(col("sh")).as("gh"))
      .distinct()
    val firsts = hashed.groupBy(col("gh"))
      .agg(min(col("doc_id")).as("first_doc"))
    val per = hashed.join(firsts, "gh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), lit(1L))
          .otherwise(lit(0L))).as("n_novel"))
    docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        coalesce(expr("n_novel * 1000000 div n_grams"), lit(0L))
          .as("novelty_ppm"))
  }

  /** Cross-document boilerplate coverage (the RefinedWeb/C4-class
    * "duplicated n-gram fraction" quality signal): for each document,
    * the fraction of its word `n`-grams (counted with multiplicity)
    * that occur in at least one OTHER document — grams with corpus
    * document-frequency ≥ 2. High coverage = the document is mostly
    * shared template text (navigation chrome, license banners, scraped
    * mirrors); it complements [[repetitionScore]] (within-doc loops)
    * and `sharedSpans` (which localizes pairwise overlap but never
    * scores a whole document). Emitted as exact integers: gram count,
    * duplicated-gram count, and coverage in parts-per-million by
    * truncating integer division.
    *
    * Scale shape: grams travel as 64-bit hashes, never strings — the
    * df relation and the enrichment join shuffle 8-byte keys (the
    * [[Dedup.hash64]] discipline; the oracle replays the same md5
    * prefix, so collisions — which merge grams on BOTH sides — cannot
    * cause drift). Two corpus-gram-sized exchanges: the df groupBy
    * (partial-aggregated map-side) and the gram→df equi-join, whose
    * per-key fan-out is each gram's own occurrence count (a hot
    * boilerplate gram is one skewed key — AQE skew-split territory,
    * never a cross product). Docs with fewer than `n` tokens score 0.
    */
  def boilerplateScore(docs: DataFrame, n: Int = 8): DataFrame = {
    require(n > 0, s"gram size must be positive, got $n")
    graft.functions.Md5Prefix64.register(docs.sparkSession)
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("t")) - n),
          i => array_join(slice(col("t"), i + 1, lit(n)), " "))).as("g"))
      .select(col("doc_id"), Dedup.hash64(col("g")).as("gh"))
    val df = grams.groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val perDoc = grams.join(df, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, lit(1L)).otherwise(lit(0L))).as("n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        expr("n_dup * 1000000 div n_grams").as("dup_ppm"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("dup_ppm"), lit(0L)).as("dup_ppm"))
  }

  /** Corpus-bigram affinity score (an n-gram-LM proxy for perplexity
    * filtering): for each in-document bigram (w1, w2), the scaled
    * conditional probability (count(w1,w2)·10⁶) div count(w1·) — exact
    * integer — summed per document; `affinity` = the mean, in [0, 1].
    * Low affinity = the document's word transitions are unusual for the
    * corpus (gibberish, wrong-language, boilerplate soup).
    *
    * Scale shape: the bigram/left-unigram count relations are corpus-
    * sized, so both enrichment joins are shuffled equi-joins on the gram
    * keys (partial-aggregated map-side); nothing driver-sized. Documents
    * with < 2 tokens have no bigrams and are dropped.
    */
  def bigramAffinity(docs: DataFrame): DataFrame =
    bigramAffinityAgainst(docs, docs)

  /** [[bigramAffinity]] generalized to a REFERENCE-trained model (the
    * CCNet discipline): the bigram statistics come from `ref` — a
    * curated clean subset — and every document scores its affinity to
    * THAT distribution, so in-domain text scores high and
    * out-of-distribution text low regardless of how much of the corpus
    * it makes up (self-training lets a large junk cluster legitimize
    * itself). Bigrams absent from the reference contribute 0 — the
    * deterministic zero-backoff choice (CCNet's smoothed perplexity is
    * an FP-model concern; exact integer conditionals keep the oracle
    * bit-exact). `bigramAffinity(docs)` is the self-trained special
    * case (every bigram is in-model, so the left joins never miss).
    *
    * Scale shape: two vocabulary-sized aggregates of the reference +
    * two bigram-keyed equi-joins; the reference relation is typically
    * a small fixed corpus, but the joins stay keyed (never broadcast
    * by assumption — AQE decides when ref is actually small).
    */
  def bigramAffinityAgainst(docs: DataFrame, ref: DataFrame): DataFrame = {
    def bigrams(d: DataFrame) = d
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= 2)
      .select(col("doc_id"), explode(
        zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val refBg = bigrams(ref)
    val c2 = refBg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = refBg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    bigrams(docs)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .select(col("doc_id"),
        coalesce(expr("(c2 * 1000000L) div c1"), lit(0L)).as("p_scaled"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_scaled")).as("sum_p"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_p"),
        (col("sum_p").cast("double") / col("n_bigrams") / 1e6).as("affinity"))
  }

  // hash constants live on the Expression (single source of truth);
  // aliased here because the generated DuckDB oracle SQL reads them
  val FpBase: Long = graft.functions.RollingFingerprint.Base
  val FpMod: Long = graft.functions.RollingFingerprint.Mod
  val FpGram: Int = graft.functions.RollingFingerprint.Gram
  /** FpBase^j mod FpMod for j < FpGram — literal powers shared with SQL. */
  val FpPowers: Seq[Long] = graft.functions.RollingFingerprint.Powers.toSeq

  /** Polynomial rolling-hash fingerprint over character 8-grams:
    * h(i) = sum_j ascii(text[i+j]) * B^j mod M; the document fingerprint
    * is the minimum hash (winnowing-style) plus the distinct-gram count.
    *
    * One codegen'd pass per document ([[graft.functions.RollingFingerprint]])
    * — the declarative explode-per-position form shuffles O(len²) bytes
    * (each gram row carries the full text) through a hash aggregate; this
    * is a pure projection, no exchange at all. Documents shorter than
    * [[FpGram]] codepoints produce no grams and are dropped, exactly as
    * the grouped form drops them.
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    val fp = graft.functions.RollingFingerprint.rollingFp(docs.sparkSession)(col("text"))
    docs
      .where(length(col("text")) >= FpGram)
      .select(col("doc_id"), fp.as("fp"))
      .select(col("doc_id"),
        col("fp.fp_min").as("fp_min"), col("fp.n_grams").as("n_grams"))
  }

  /** Maximal EXACT shared token spans across documents — the
    * exact-substring-dedup primitive (the published recipe: find
    * ≥ k-token substrings repeated across a corpus and cut them; cf.
    * suffix-array dedup in the training-data-dedup literature, here as
    * a distributed fingerprint join instead of a suffix array):
    *
    *  1. every doc explodes into positioned token k-grams (narrow,
    *     zero-exchange projection), each hashed to the shared 60-bit
    *     md5 prefix;
    *  2. grams occurring in more than `maxDf` docs are dropped — the
    *     stop-phrase cap, same economics as [[Dedup.ngramJaccardPairs]]
    *     (bounds every join bucket, so candidate volume is
    *     df-capped × positions, never corpus²);
    *  3. docs sharing a (capped) gram join on the hash, yielding
    *     positioned hits (doc_a, doc_b, pos_a, pos_b);
    *  4. hits on the same DIAGONAL (pos_a − pos_b) with consecutive
    *     positions are one shared region: the gaps-and-islands trick
    *     (pos_a − row_number over the diagonal) labels each maximal
    *     run, and one aggregate emits (start_a, start_b, len_tokens =
    *     run + k − 1).
    *
    * Output spans are maximal per diagonal and ≥ k tokens by
    * construction. Identity is by 60-bit gram hash (both engines replay
    * the same arithmetic, so the q107 oracle is exact); a true-text
    * confirm pass would carry gram strings through the join — callers
    * needing it re-read the k-gram at (doc, start) and compare, one
    * point lookup per emitted span.
    */
  /** BPE vocabulary training — the canonical subword-vocab induction
    * step of every LLM preprocessing stack. HYBRID shape (the
    * HF-tokenizers / SentencePiece architecture, and the 100 TB-correct
    * one): ONE corpus-scale job aggregates the word histogram — fully
    * partial-aggregable, the only step that touches the corpus — then
    * the histogram collects to the driver (vocabulary-sized by
    * construction: distinct words, optionally `minCount`-pruned, the
    * standard induction cap) and the merge loop runs in memory via
    * [[bpeMergeLoop]]. Per-round cost is an O(affected-words) update,
    * not a Spark job: at a production 32k–50k-merge vocabulary the
    * previous relational loop was ~10⁵ sequential driver-orchestrated
    * jobs — hours of pure per-job fixed cost no cluster width can
    * amortize — where this loop is CPU-seconds.
    *
    * Returns the merge table (rank, left, right, freq) — the vocab
    * artifact a tokenizer consumes. Deterministic and engine-identical:
    * counts are exact longs, the (freq DESC, left, right) tie-break
    * orders left/right by UTF-8 BYTES on every path (in-memory loop,
    * [[bpeTrainRelational]], and the DuckDB oracle's default bytewise
    * collation — same collation pin as [[bpeVocab]]), and the result is
    * independent of histogram collect order. NaiveCrossCheckSpec pins
    * it against a textbook pure-Scala BPE AND against the relational
    * formulation; [[bpeTrainOracleSql]] replays every training round in
    * DuckDB for the driver gate.
    *
    * `minCount` (default 1 = exact parity with the oracle) drops
    * words rarer than the threshold BEFORE the collect — the knob that
    * bounds driver memory on an open-vocabulary 100 TB crawl, at the
    * (industry-standard) cost of ignoring hapax words' pair counts.
    */
  def bpeTrain(docs: DataFrame, nMerges: Int, minCount: Long = 1L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hist = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
      .as[(String, Long)].collect()
    bpeMergeLoop(hist, nMerges).toDF("rank", "left", "right", "freq")
  }

  /** Unsigned UTF-8 bytewise string comparison — the one collation every
    * engine here agrees on (Spark `cast(binary)` ordering, DuckDB's
    * default VARCHAR collation, and this in-memory comparator). */
  private[ext] def utf8Compare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  /** The in-memory BPE merge loop over a word histogram — classic
    * incremental-update formulation: a pair→count map, a pair→words
    * inverted index (lazily stale, re-validated by a containment scan),
    * and a lazy-invalidation priority queue for the argmax (every count
    * update pushes a fresh heap entry; polled entries whose frequency
    * no longer matches the live map are discarded). Applying a merge
    * re-counts ONLY the words containing the merged pair — the same
    * greedy left scan as [[bpeSegment]], so train and apply can never
    * disagree on run collapsing. O(updates · log heap) total; the whole
    * loop is bounded by histogram size, never corpus size.
    */
  private[ext] def bpeMergeLoop(hist: Array[(String, Long)],
                                nMerges: Int): Seq[(Long, String, String, Long)] = {
    val wordN = hist.map(_._2)
    val words: Array[Array[String]] = hist.map(_._1.split("").filter(_.nonEmpty))
    val counts = new java.util.HashMap[(String, String), Long]()
    val index = new java.util.HashMap[(String, String), java.util.HashSet[Integer]]()
    val cmp = new java.util.Comparator[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c0 = java.lang.Long.compare(b._1, a._1)
        if (c0 != 0) c0
        else {
          val c1 = utf8Compare(a._2, b._2)
          if (c1 != 0) c1 else utf8Compare(a._3, b._3)
        }
      }
    }
    val pq = new java.util.PriorityQueue[(Long, String, String)](math.max(1, hist.length), cmp)
    def bump(p: (String, String), d: Long): Unit = {
      val nv = counts.getOrDefault(p, 0L) + d
      if (nv == 0L) counts.remove(p)
      else {
        counts.put(p, nv)
        // push on EVERY update (including decrements): the live count
        // must always have a matching heap entry, else a pair whose
        // count only ever falls after init is never pollable again
        pq.add((nv, p._1, p._2))
      }
    }
    for (i <- words.indices; j <- 0 until words(i).length - 1) {
      bump((words(i)(j), words(i)(j + 1)), wordN(i))
      index.computeIfAbsent((words(i)(j), words(i)(j + 1)),
        _ => new java.util.HashSet[Integer]()).add(i)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      // pop stale entries; heap top with a LIVE count is the true argmax
      // (every live count has a fresh entry pushed at its last update)
      var top: (Long, String, String) = null
      while (top == null && !done) {
        val c = pq.poll()
        if (c == null) done = true
        else if (counts.getOrDefault((c._2, c._3), 0L) == c._1) {
          if (c._1 >= 2L) top = c else done = true
        }
      }
      if (!done) {
        val (f, l, rr) = (top._1, top._2, top._3)
        out += ((r.toLong, l, rr, f))
        val affected = index.remove((l, rr))
        if (affected != null) affected.forEach { boxed =>
          val i: Int = boxed
          val syms = words(i)
          var j = 0
          var has = false
          while (j < syms.length - 1 && !has) {
            if (syms(j) == l && syms(j + 1) == rr) has = true
            j += 1
          }
          if (has) { // index entries can be stale after earlier merges
            var k = 0
            while (k < syms.length - 1) {
              bump((syms(k), syms(k + 1)), -wordN(i)); k += 1
            }
            val ns = scala.collection.mutable.ArrayBuffer.empty[String]
            for (x <- syms) {
              if (ns.nonEmpty && ns.last == l && x == rr)
                ns(ns.length - 1) = l + rr
              else ns += x
            }
            words(i) = ns.toArray
            k = 0
            while (k < words(i).length - 1) {
              val p = (words(i)(k), words(i)(k + 1))
              bump(p, wordN(i))
              index.computeIfAbsent(p, _ => new java.util.HashSet[Integer]()).add(i)
              k += 1
            }
          }
        }
      }
      r += 1
    }
    out.toSeq
  }

  /** The RELATIONAL formulation of [[bpeTrain]] — one Spark job per
    * merge round over the vocabulary-sized word-histogram relation.
    * Kept as the distributed cross-check (NaiveCrossCheckSpec pins
    * hybrid == relational on random corpora) and as the shape the
    * DuckDB oracle round-unrolls; NOT the default path, because its
    * O(nMerges) sequential driver-orchestrated rounds are a fixed-cost
    * wall at production vocabularies (~10⁵ jobs at 32k merges) that no
    * cluster width amortizes — the one design the r7 audit graded
    * `weak` for the 100× bar.
    *
    *  per round r < nMerges:
    *   1. adjacent symbol pairs of every word, weighted by word count —
    *      one explode + hash aggregate (map-side partials);
    *   2. best pair = max count, ties broken on (left, right) UTF-8
    *      byte order — a driver-side head() of ONE row;
    *   3. apply the merge to every word's symbol array with a fold
    *      (`aggregate` HOF — a left scan replacing [left, right] runs);
    *      stop early when no pair repeats (freq < 2).
    */
  def bpeTrainRelational(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the histogram aggregate is the ONLY corpus-scale job; the loop
    // then iterates over a VOCAB-sized relation — coalesce it to one
    // partition so each round is one task of fixed work instead of a
    // session-width fan of empty tasks
    var words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      // split(w, "") keeps a trailing "" under Spark's limit=-1 — drop it
      .select(col("n"), array_remove(split(col("w"), ""), "").as("syms"))
      .coalesce(1)
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val pairs = words
        .select(col("n"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .groupBy(col("p.0").as("l"), col("p.1").as("r"))
        .agg(sum(col("n")).as("freq"))
      val top = pairs.orderBy(col("freq").desc,
        col("l").cast("binary"), col("r").cast("binary")).head(1)
      if (top.isEmpty || top.head.getAs[Long]("freq") < 2) done = true
      else {
        val (l, rr, f) = (top.head.getAs[String]("l"),
          top.head.getAs[String]("r"), top.head.getAs[Long]("freq"))
        merges += ((r.toLong, l, rr, f))
        // left-scan merge: append each symbol, collapsing a trailing
        // [l, rr] into the merged token (matches the textbook greedy
        // left-to-right application). Typed HOF API — the symbols ride
        // as lit() columns, so corpus text needs no SQL escaping at all
        // (quotes, backslashes, anything).
        val merged = aggregate(
          col("syms"),
          array().cast("array<string>"),
          (acc, x) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(rr),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + rr))))
            .otherwise(concat(acc, array(x))))
        words = words.select(col("n"), merged.as("syms")).localCheckpoint(true)
      }
      r += 1
    }
    merges.toSeq.toDF("rank", "left", "right", "freq")
  }

  /** BPE ENCODE: segment text with a learned merge table ([[bpeTrain]]'s
    * output, rank order) — the tokenizer's apply step. Per word: start
    * from characters, apply each merge as a greedy left scan in rank
    * order; pieces concatenate back to the exact word (lossless by
    * construction — the scan only regroups, never rewrites).
    *
    * Scale shape: a pure narrow per-row kernel in `mapPartitions` — the
    * justified imperative exception (same rule as the farbfeld codec):
    * tokenization is sequential in-place scans per word, which Catalyst
    * can only express as NESTED interpreted HOF lambdas — measured 26 s
    * for 5k docs × 30 merges where this compiled loop is sub-second.
    * The merge table ships as a closure (driver-side vocab artifact,
    * like the PQ codebooks); no shuffle, no state. Emits (doc_id,
    * n_pieces, pieces) with pieces "|"-joined.
    *
    * VOCAB-SIZE INDEPENDENCE (round-12): the naive form runs |merges|
    * scans per word — O(|word|·nMerges), a dead end at a production
    * 50k-merge vocab. This kernel instead looks up each ADJACENCY in a
    * pair→ranks index and jumps straight to the smallest applicable
    * rank greater than the last applied one — an EXACT simulation of
    * the sequential per-rank scan (a skipped rank's pair is absent at
    * the moment the sequential pass would have processed it, and state
    * does not change between applications, so the first present rank
    * is the same in both; sequential never revisits a passed rank, and
    * neither does the simulation — bit-equal for ARBITRARY tables,
    * duplicates included, property-pinned in ExtSpec against the naive
    * reference). Cost: O(applied · |word|) pair lookups per word —
    * independent of nMerges; at most |word|−1 merges can ever apply.
    */
  def bpeSegment(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val table = merges.toArray
    // pair -> ascending ranks; duplicates kept so a re-listed pair
    // replays exactly like the sequential scan (a later duplicate only
    // fires if its adjacency reappears after the earlier application)
    val rankIdx: Map[(String, String), Array[Int]] =
      merges.zipWithIndex.groupBy(_._1).map { case (p, rs) =>
        p -> rs.map(_._2).toArray.sorted
      }
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
        for (w <- text.split(" ") if w.nonEmpty) {
          var syms: scala.collection.mutable.ArrayBuffer[String] =
            scala.collection.mutable.ArrayBuffer.from(w.split(""))
          var last = -1
          var halt = false
          while (!halt) {
            var bestRank = Int.MaxValue
            var i = 0
            while (i < syms.length - 1) {
              rankIdx.get((syms(i), syms(i + 1))) match {
                case Some(rs) =>
                  var j = 0
                  while (j < rs.length && rs(j) <= last) j += 1
                  if (j < rs.length && rs(j) < bestRank) bestRank = rs(j)
                case None =>
              }
              i += 1
            }
            if (bestRank == Int.MaxValue) halt = true
            else {
              val (l, r) = table(bestRank)
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              for (x <- syms) {
                if (out.nonEmpty && out.last == l && x == r)
                  out(out.length - 1) = l + r
                else out += x
              }
              syms = out
              last = bestRank
            }
          }
          pieces ++= syms
        }
        (id, pieces.length.toLong, pieces.mkString("|"))
      }).toDF("doc_id", "n_pieces", "pieces")
  }

  // ── BPE DuckDB oracles: the training recurrence unrolled into CTEs ──
  //
  // The key identity that makes BPE SQL-expressible: the greedy
  // left-to-right merge scan (collapse every [l, r] run, leftmost
  // first, no re-merge of the token it just created — l+r never equals
  // l since r is non-empty) is EXACTLY "replace the leftmost
  // non-overlapping occurrences of the pair". So a word's symbol array
  // rides as a delimited string — each symbol wrapped in chr(31)
  // sentinels, i.e. [a,b] ⇒ ␟a␟␟b␟ — and one `replace(s, ␟l␟␟r␟,
  // ␟lr␟)` applies a whole merge round: the doubled inner sentinel
  // means adjacent matches can't share a boundary character, and
  // symbols never contain chr(31), so matches align exactly with
  // symbol pairs. Each round is then three CTEs: pair histogram
  // (explode adjacent pairs weighted by word count), argmax with the
  // (freq DESC, l, r) tie-break, and the replace; the merge decision
  // feeds forward as scalar subqueries — the same round-unrolling
  // discipline as KMeans.ivfpqOracleSql and the PageRank recurrence.
  // MATERIALIZED is load-bearing twice over: it stops DuckDB's CTE
  // inlining from going exponential in nMerges, and it keeps the
  // parquet-backed `documents` view from being re-opened per round.
  private val Sep = "chr(31)"
  private val SepSep = s"$Sep||$Sep"

  /** chr(31)-delimited character-split of a (SQL expression) string. */
  private def delimSql(e: String): String =
    s"$Sep||array_to_string(string_split($e, ''), $SepSep)||$Sep"

  /** The shared training CTE chain: s0 (word histogram as delimited
    * strings), then per round r: p{r} pair counts, b{r} best pair,
    * s{r+1} merged histogram. b{r} is empty once training stops
    * (freq < 2) — the CASE guard makes every later round a no-op,
    * matching the Spark loop's early exit.
    */
  private def bpeTrainCtes(nMerges: Int): Seq[String] = {
    val s0 =
      s"""s0 AS MATERIALIZED (SELECT cast(count(*) AS BIGINT) AS n,
         |  ${delimSql("w")} AS s
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE len(w) > 0 GROUP BY w)""".stripMargin
    s0 +: (0 until nMerges).flatMap { r =>
      Seq(
        s"""p$r AS MATERIALIZED (SELECT syms[i] AS l, syms[i+1] AS r,
           |  cast(sum(n) AS BIGINT) AS freq
           |  FROM (SELECT n, syms, unnest(range(1, len(syms))) AS i
           |        FROM (SELECT n, string_split(trim(s, $Sep), $SepSep) AS syms
           |              FROM s$r))
           |  GROUP BY 1, 2)""".stripMargin,
        s"""b$r AS MATERIALIZED (SELECT l, r, freq FROM p$r
           |  WHERE freq >= 2 ORDER BY freq DESC, l, r LIMIT 1)""".stripMargin,
        s"""s${r + 1} AS MATERIALIZED (SELECT n, ${mergeRoundSql(r)} AS s
           |  FROM s$r)""".stripMargin)
    }
  }

  /** One merge round as a guarded replace over delimited string `s`. */
  private def mergeRoundSql(r: Int): String =
    s"""CASE WHEN (SELECT count(*) FROM b$r) = 0 THEN s
       |  ELSE replace(s, (SELECT $Sep||l||$SepSep||r||$Sep FROM b$r),
       |                  (SELECT $Sep||l||r||$Sep FROM b$r)) END""".stripMargin

  /** DuckDB oracle for [[bpeTrain]]: emits (rank, left, right, freq). */
  def bpeTrainOracleSql(nMerges: Int): String = {
    val union = (0 until nMerges).map { r =>
      s"""SELECT cast($r AS BIGINT) AS "rank", l AS "left", r AS "right", freq FROM b$r"""
    }.mkString("\nUNION ALL ")
    s"WITH ${bpeTrainCtes(nMerges).mkString(",\n")}\nSELECT * FROM ($union)"
  }

  /** Full segmentation CTE chain: the training CTEs, then every
    * round's replace applied to each word of each document in rank
    * order, stitched back in word order — ends with `agg`
    * (doc_id, n_pieces, pieces) in scope. Shared by
    * [[bpeSegmentOracleSql]] and [[bpeStatsOracleSql]]. */
  private def bpeSegmentCtes(nMerges: Int): String = {
    val d0 =
      s"""d0 AS MATERIALIZED (SELECT doc_id, wi, ${delimSql("w")} AS s
         |  FROM (SELECT doc_id, t[i] AS w, i AS wi
         |        FROM (SELECT doc_id, t, unnest(range(1, len(t)+1)) AS i
         |              FROM (SELECT doc_id, string_split(text, ' ') AS t
         |                    FROM documents)))
         |  WHERE len(w) > 0)""".stripMargin
    val rounds = (0 until nMerges).map { r =>
      s"""d${r + 1} AS MATERIALIZED (SELECT doc_id, wi, ${mergeRoundSql(r)} AS s
         |  FROM d$r)""".stripMargin
    }
    val agg =
      s"""agg AS MATERIALIZED (SELECT doc_id, cast(sum(len(p)) AS BIGINT) AS n_pieces,
         |  string_agg(array_to_string(p, '|'), '|' ORDER BY wi) AS pieces
         |  FROM (SELECT doc_id, wi, string_split(trim(s, $Sep), $SepSep) AS p
         |        FROM d$nMerges)
         |  GROUP BY doc_id)""".stripMargin
    (bpeTrainCtes(nMerges) ++ (d0 +: rounds) :+ agg).mkString(",\n")
  }

  /** DuckDB oracle for [[bpeSegment]] over merges learned by
    * [[bpeTrain]] on the same corpus — emits (doc_id, n_pieces, pieces)
    * exactly like the Spark kernel.
    */
  def bpeSegmentOracleSql(nMerges: Int): String =
    s"""WITH ${bpeSegmentCtes(nMerges)}
       |SELECT d.doc_id, coalesce(a.n_pieces, cast(0 AS BIGINT)) AS n_pieces,
       |       coalesce(a.pieces, '') AS pieces
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** DuckDB oracle for the per-language tokenizer-fit rollup (q119):
    * the segmentation replay aggregated per language — pieces, raw
    * tokens, chars (exact longs) and the pieces-per-token compression
    * ratio (one division of exact values, identical IEEE in both
    * engines). */
  def bpeStatsOracleSql(nMerges: Int): String =
    s"""WITH ${bpeSegmentCtes(nMerges)}
       |SELECT d.lang, count(*) AS n_docs,
       |  cast(sum(coalesce(a.n_pieces, 0)) AS BIGINT) AS pieces,
       |  cast(sum(len(string_split(d.text, ' '))) AS BIGINT) AS tokens,
       |  cast(sum(length(d.text)) AS BIGINT) AS chars,
       |  cast(sum(coalesce(a.n_pieces, 0)) AS DOUBLE)
       |    / cast(sum(len(string_split(d.text, ' '))) AS BIGINT) AS pieces_per_token
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |GROUP BY d.lang""".stripMargin

  /** [[bpeTrain]]'s merge table memoized per (corpus key, nMerges) for
    * this JVM session — the tokenizer-artifact analog of
    * `Similarity.sessionPqIndex`: vocabulary training is an amortized
    * offline job in production, so consumers (segmentation, fit stats)
    * should pay lookup cost, not retraining. Training is deterministic,
    * which makes the cache semantically invisible; q109 stays the one
    * registered query that prices training itself. */
  private val sessionMerges =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()
  def sessionBpeMerges(docs: DataFrame, corpusKey: String,
                       nMerges: Int): Seq[(String, String)] =
    sessionMerges.computeIfAbsent(s"$corpusKey|$nMerges", _ =>
      bpeTrain(docs, nMerges).orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)

  /** BPE VOCABULARY as a dense id map: every distinct piece the
    * segmentation emits, ranked by corpus frequency (ties → piece
    * lexicographic) into contiguous 0-based ids — the artifact a
    * tokenizer DEPLOYMENT ships (ids are what reaches the model;
    * strings never do). Input is [[bpeSegment]]'s output.
    *
    * Scale: the vocabulary is metadata-sized by construction — every
    * piece is either a single character or the product of one of the
    * nMerges merges, so |vocab| ≤ |alphabet| + nMerges regardless of
    * corpus size. The single-partition ranking window is therefore a
    * constant-size step (same adjudication as the k-row centroid
    * relations), downstream of a corpus-wide but fully partial-
    * aggregable frequency count.
    *
    * The frequency tie-break orders on the piece's UTF-8 BYTES, not the
    * string: Spark string comparison is UTF-16 code units while the
    * DuckDB oracle's collation is UTF-8 bytewise — for non-ASCII
    * vocabularies (supplementary-plane characters) the two orders
    * diverge, so both sides pin the same bytewise order explicitly
    * (oracle: ORDER BY encode(piece)).
    */
  def bpeVocab(seg: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("piece").cast("binary"))
    seg.where(col("pieces") =!= "")
      .select(explode(split(col("pieces"), "\\|")).as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("freq"))
      .withColumn("id", row_number().over(w).cast("long") - 1)
  }

  /** BPE ENCODE-TO-IDS: the full tokenizer apply surface — segment with
    * the merge table, then map each piece through the [[bpeVocab]] id
    * map, emitting (doc_id, n_pieces, ids) with ids comma-joined in
    * piece order (docs with no words encode to n_pieces=0, ids='').
    * The vocab relation broadcasts (metadata-sized, see [[bpeVocab]]);
    * reassembly is one doc_id groupBy with an order-restoring
    * array_sort — the same positional-stitch discipline as q113.
    *
    * The decode(encode(x)) law: pieces concatenate back to exactly the
    * words of x ([[bpeSegment]]'s lossless-regroup contract), so
    * [[bpeDecodeIds]] of this output restores x up to the single
    * spaces the word-splitter consumed — asserted as a law in
    * TextAnalysisSpec.
    */
  def bpeEncodeIds(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val seg = bpeSegment(docs, merges)
    val vocabMap = bpeVocab(seg).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    encodeSegWithVocab(seg, vocabMap)
  }

  /** The piece→id mapping shared by [[bpeEncodeIds]] (vocab derived
    * in-query) and [[bpeEncodeIdsFromModel]] (vocab loaded from a
    * persisted artifact): a ZERO-EXCHANGE narrow projection. The vocab
    * is metadata-sized by construction (≤ |alphabet| + nMerges, see
    * [[bpeVocab]]), so it rides as a map LITERAL over the already-
    * ordered pieces string — no explode, no join, no re-stitch window;
    * the earlier explode → broadcast-join → groupBy/array_sort
    * formulation paid two aggregation exchanges for what is a pure
    * per-row lookup. An unknown piece (text not covered by the
    * artifact's alphabet) FAILS LOUDLY instead of silently dropping an
    * id — the coalesce short-circuits, so the error expression never
    * evaluates on covered pieces. */
  private def encodeSegWithVocab(seg: DataFrame,
                                 vocabMap: Map[String, Long]): DataFrame = {
    val mapLit =
      if (vocabMap.isEmpty) map().cast("map<string,bigint>")
      else map(vocabMap.toSeq.sortBy(_._2).flatMap {
        case (p, i) => Seq(lit(p), lit(i)) }: _*)
    // try_element_at (not element_at): ANSI mode makes the plain form
    // throw its own generic error on a missing key — the try_ variant
    // yields null so the coalesce can raise the diagnostic one
    seg.select(col("doc_id"), col("n_pieces"),
      when(col("pieces") === "", lit(""))
        .otherwise(array_join(transform(split(col("pieces"), "\\|"),
          p => coalesce(try_element_at(mapLit, p),
            raise_error(concat(lit("bpe encode: piece not in vocab: "), p))
              .cast("long")).cast("string")), ",")).as("ids"))
  }

  /** Persist a trained tokenizer as a two-table parquet artifact —
    * `merges` (rank, left, right) and `vocab` (piece, freq, id) — the
    * thing a tokenizer DEPLOYMENT actually ships between the training
    * job and every consumer (same discipline as the persisted ANN
    * indexes: train offline once, probe forever). Both tables are
    * metadata-sized (≤ |alphabet| + nMerges rows). */
  def saveBpeModel(spark: org.apache.spark.sql.SparkSession,
                   merges: Seq[(String, String)], vocab: DataFrame,
                   path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    vocab.coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Load the merge table of a [[saveBpeModel]] artifact, rank order. */
  def loadBpeMerges(spark: org.apache.spark.sql.SparkSession,
                    path: String): Seq[(String, String)] =
    spark.read.parquet(s"$path/merges").orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq

  /** ENCODE against a persisted tokenizer artifact: merges ride as a
    * closure into the segmentation kernel (driver-side, rank order),
    * the vocab relation broadcasts from its parquet table — no
    * training work at all, the deployment probe path. Output is
    * byte-identical to [[bpeEncodeIds]] when the artifact was trained
    * on the same corpus (q127's oracle is exactly q121's). */
  def bpeEncodeIdsFromModel(docs: DataFrame, path: String): DataFrame = {
    val spark = docs.sparkSession
    val seg = bpeSegment(docs, loadBpeMerges(spark, path))
    val vocabMap = spark.read.parquet(s"$path/vocab").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    encodeSegWithVocab(seg, vocabMap)
  }

  /** BPE DECODE: ids back to text via the vocab map — (doc_id, decoded)
    * where decoded is the piece concatenation (word boundaries were
    * consumed by the splitter, so decoded == original text minus its
    * spaces; see [[bpeEncodeIds]]). Inverse direction of the same
    * broadcast join + positional stitch. */
  def bpeDecodeIds(enc: DataFrame, vocab: DataFrame): DataFrame = {
    val pos = enc.where(col("ids") =!= "")
      .select(col("doc_id"),
        posexplode(split(col("ids"), ",")).as(Seq("pos", "id_s")))
      .select(col("doc_id"), col("pos"), col("id_s").cast("long").as("id"))
    val dec = pos.join(broadcast(vocab.select(col("id"), col("piece"))), "id")
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("piece")))),
        x => x.getField("piece")), "").as("decoded"))
    enc.select(col("doc_id")).join(dec, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("decoded"), lit("")).as("decoded"))
  }

  /** DuckDB oracle for [[bpeEncodeIds]] with merges trained on the same
    * corpus: the segmentation replay, the frequency-ranked id map, and
    * the positional re-stitch — emits (doc_id, n_pieces, ids). */
  def bpeEncodeIdsOracleSql(nMerges: Int): String =
    s"""WITH ${bpeSegmentCtes(nMerges)},
       |pc AS (SELECT unnest(string_split(pieces, '|')) AS piece
       |       FROM agg WHERE pieces <> ''),
       |vocab AS (SELECT piece,
       |    row_number() OVER (ORDER BY count(*) DESC, encode(piece)) - 1 AS id
       |  FROM pc GROUP BY piece),
       |pp AS (SELECT doc_id, ps[i] AS piece, i AS pos
       |  FROM (SELECT doc_id, ps, unnest(range(1, len(ps) + 1)) AS i
       |        FROM (SELECT doc_id, string_split(pieces, '|') AS ps
       |              FROM agg WHERE pieces <> ''))),
       |enc AS (SELECT pp.doc_id, cast(count(*) AS BIGINT) AS n_pieces,
       |    string_agg(cast(v.id AS VARCHAR), ',' ORDER BY pp.pos) AS ids
       |  FROM pp JOIN vocab v USING (piece) GROUP BY pp.doc_id)
       |SELECT d.doc_id, coalesce(e.n_pieces, cast(0 AS BIGINT)) AS n_pieces,
       |       coalesce(e.ids, '') AS ids
       |FROM documents d LEFT JOIN enc e USING (doc_id)""".stripMargin

  /** Exact substring-dedup REWRITE — consumes [[sharedSpans]] and
    * actually removes the repeated text: for every maximal shared span,
    * the occurrence in the LOWER doc_id survives (first-wins, the P7
    * convention) and the higher doc's copy is cut; a doc's surviving
    * tokens re-join into the rewritten text. Emits
    * (doc_id, n_removed, text_clean) for every input doc — docs with no
    * duplicated spans pass through byte-for-byte with n_removed = 0.
    *
    * Shape: the span relation groups into one small interval array per
    * affected doc (bounded by the df cap's candidate economics — a doc
    * can carry at most its-token-count intervals), which rides a LEFT
    * join back onto the corpus; the rewrite is a positional `filter`
    * HOF with an `exists` over that array — overlap between intervals
    * needs no merge pass, coverage is just the disjunction. One
    * shuffle beyond sharedSpans' own (the per-doc interval groupBy);
    * the corpus-side join is doc_id-keyed.
    */
  def cutSharedSpans(docs: DataFrame, k: Int = 8,
                     maxDf: Int = Dedup.DefaultMaxShingleDf): DataFrame =
    cutSpans(docs, sharedSpans(docs, k, maxDf))

  /** The rewrite half of [[cutSharedSpans]] over an already-computed
    * spans relation — q113 reads the session-cached q107 spans instead
    * of re-mining them (round-16; the jaccard5Clusters discipline). */
  def cutSpans(docs: DataFrame, spans: DataFrame): DataFrame = {
    val cuts = spans
      .groupBy(col("doc_b").as("doc_id"))
      .agg(collect_list(struct(col("start_b").as("s"),
        (col("start_b") + col("len_tokens")).as("e"))).as("ivs"))
    val toks = split(col("text"), " ")
    val ivs = coalesce(col("ivs"),
      array().cast("array<struct<s:bigint,e:bigint>>"))
    val kept = filter(toks, (x, i) =>
      !exists(ivs, iv => i >= iv.getField("s") && i < iv.getField("e")))
    docs.join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (size(toks) - size(kept)).cast("long").as("n_removed"),
        array_join(kept, " ").as("text_clean"))
  }

  /** Composite (doc, chunk) key base for [[dedupParagraphs]]: chunk_id
    * rides in the low bits, so key order == (doc_id, chunk_id) order —
    * the first-wins total order — and both engines replay the same
    * arithmetic. 2²⁰ chunks/doc = 16M tokens/doc at the default grain;
    * an assert_true in the key projection turns overflow into a loud
    * per-row failure instead of silent key collisions. */
  val ChunkKeyBase: Long = 1L << 20

  /** PARAGRAPH-grain near-dedup — boilerplate removal, the grain real
    * pipelines dedup at (headers, nav bars, license blurbs repeat
    * across documents while the documents themselves are distinct, so
    * document-grain dedup never sees them): non-overlapping token
    * chunks ([[chunk]] at stride == size, the q76 roundtrip grain)
    * stand in for paragraphs; each chunk gets a production-width
    * 64-bit SimHash fingerprint (q92's generator verbatim, over the
    * chunk relation keyed by doc_id·2²⁰ + chunk_id); any chunk
    * near-dup to a lower-keyed chunk is CUT (first-wins in
    * (doc_id, chunk_id) order — q113's discipline, and within-doc
    * repeats dedup too); survivors [[reassemble]] in chunk order.
    * Emits (doc_id, n_removed_chunks, text_clean) for EVERY input doc
    * — untouched docs pass through with n_removed_chunks = 0, a doc
    * whose every chunk was cut emits ''.
    *
    * Scale shape: chunking is a narrow explode (rows × ~tokens/grain);
    * the pair source is the banded SimHash equi-join (never corpus²);
    * the cut is one keyed anti-join; reassembly one hash aggregate.
    * All chunk-volume-sized — the same economics as the document-grain
    * chain, one granularity down.
    *
    * `maxBandDf` (0 = uncapped, the exact semantics the q130 oracle
    * states) — the CHUNK-DF cap, round-19: at corpus scale the hot
    * band buckets ARE the boilerplate this operator exists to remove
    * (one nav-bar chunk in 10⁶ pages = 10⁶ identical fingerprints in
    * one bucket → a quadratic clique), so production arms the cap and
    * the pair source emits a star around each over-cap bucket's
    * minimum instead (see
    * [[graft.ext.Dedup.fingerprintHammingPairs]]). The cut set is
    * EXACTLY preserved for identical-fingerprint boilerplate (every
    * member pairs with the bucket-min representative at distance 0 —
    * first-wins cuts all but the representative, as uncapped would);
    * what can escape is a chunk near-dup ONLY to non-representative
    * members and only via over-cap buckets — the q213 monotone-
    * softening trade, spec-pinned. Registered as q232 with the cap
    * armed against q130's verbatim oracle: the organic fixture's
    * buckets never reach the cap, so the driver gate proves the
    * capped plan's no-op contract on real data.
    */
  def dedupParagraphs(docs: DataFrame, chunkTok: Int = 16,
                      maxDist: Int = 3, maxBandDf: Int = 0): DataFrame = {
    val chunks = chunk(docs, chunkTok, chunkTok)
      .withColumn("ck", when(
        assert_true(col("chunk_id") < ChunkKeyBase,
          lit(s"dedupParagraphs: chunk_id >= $ChunkKeyBase overflows the " +
            "composite key — raise ChunkKeyBase")).isNull,
        col("doc_id") * ChunkKeyBase + col("chunk_id")))
    val keyed = chunks.select(col("ck").as("doc_id"),
      col("chunk_text").as("text"))
    val cut = Dedup.simhashHammingPairs(keyed, maxDist = maxDist,
      bits = 64, nBands = 4, maxBandDf = maxBandDf)
      .select(col("doc_b").as("ck")).distinct()
    val kept = chunks.join(cut, Seq("ck"), "left_anti")
    val total = chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_ch"))
    val keptCnt = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_kept"))
    val stitched = reassemble(kept)
    total
      .join(keptCnt, Seq("doc_id"), "left")
      .join(stitched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_ch") - coalesce(col("n_kept"), lit(0L))).as("n_removed_chunks"),
        coalesce(col("text"), lit("")).as("text_clean"))
  }

  /** EXACT paragraph dedup — the cheap tier of [[dedupParagraphs]] and
    * the shape C4/CCNet-class pipelines actually run first (exact
    * repeated-line/paragraph removal catches the overwhelming bulk of
    * boilerplate before any near-dup machinery runs): chunks group by
    * their CONTENT HASH and only the first occurrence in
    * (doc_id, chunk_id) order survives — the P7 first-wins total order
    * at chunk grain, [[Dedup.exact]]'s discipline one granularity
    * down. Same emit contract as [[dedupParagraphs]].
    *
    * Scale shape: ONE hash exchange (the rank window on md5, with
    * WindowGroupLimit rank pushdown — PlanSpec pins both) + the
    * reassembly aggregate; no pair relation exists at all, which is
    * why this tier runs first at 100 TB.
    */
  def dedupParagraphsExact(docs: DataFrame, chunkTok: Int = 16): DataFrame = {
    val chunks = chunk(docs, chunkTok, chunkTok)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("chunk_text")))
      .orderBy(col("doc_id"), col("chunk_id"))
    val kept = chunks.withColumn("_rk", row_number().over(w))
      .where(col("_rk") === 1).drop("_rk")
    val total = chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_ch"))
    val keptCnt = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_kept"))
    val stitched = reassemble(kept)
    total
      .join(keptCnt, Seq("doc_id"), "left")
      .join(stitched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_ch") - coalesce(col("n_kept"), lit(0L))).as("n_removed_chunks"),
        coalesce(col("text"), lit("")).as("text_clean"))
  }

  /** WITHIN-document repeated-chunk removal — the decoding-loop /
    * template scrub that runs at page grain (C4 removes repeated lines
    * within a page before any cross-document machinery): the first
    * occurrence of each chunk INSIDE a document survives, later
    * repeats are cut, and — the contract difference vs
    * [[dedupParagraphsExact]] — the same chunk appearing in two
    * DIFFERENT documents is kept in both (cross-doc dedup is a
    * separate, more expensive tier; conflating the two grains
    * over-deletes).
    *
    * Scale shape: identical to [[dedupParagraphsExact]] except the
    * rank window partitions on (doc_id, md5) — the window key CONTAINS
    * the reassembly key, so at 100 TB the exchange carries the same
    * rows and the per-doc group fits one task trivially (a document's
    * own chunks, never a global hash bucket).
    */
  def dedupParagraphsWithinDoc(docs: DataFrame, chunkTok: Int = 16): DataFrame = {
    val chunks = chunk(docs, chunkTok, chunkTok)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), md5(col("chunk_text")))
      .orderBy(col("chunk_id"))
    val kept = chunks.withColumn("_rk", row_number().over(w))
      .where(col("_rk") === 1).drop("_rk")
    val total = chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_ch"))
    val keptCnt = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_kept"))
    val stitched = reassemble(kept)
    total
      .join(keptCnt, Seq("doc_id"), "left")
      .join(stitched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_ch") - coalesce(col("n_kept"), lit(0L))).as("n_removed_chunks"),
        coalesce(col("text"), lit("")).as("text_clean"))
  }

  def sharedSpans(docs: DataFrame, k: Int = 8,
                  maxDf: Int = Dedup.DefaultMaxShingleDf): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.Md5Prefix64.register(docs.sparkSession)
    val t = split(col("text"), " ")
    // widen the gram-generation scan (r20): the per-position gram
    // build + hash is the operator's CPU wall and runs in the SCAN
    // stage — one task at fixture scale (single parquet row group), a
    // no-op on any already-wide input (Scale.widen's contract).
    // Measured: the two 1.6 s single-task gram scans of q107 spread
    // 32-way, see OPTIMIZATION_r20.md.
    val grams = graft.util.Scale.widen(docs.select(col("doc_id"), col("text")))
      .where(size(t) >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(t) - k),
        i => struct(i.as("pos"),
          array_join(slice(t, i + 1, lit(k)), " ").as("gram")))).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"),
        Dedup.hash64(col("g.gram")).as("gh"))
    // laid out by gram hash so the self-join's two (identical) subtrees
    // canonicalize to ONE exchange (ReusedExchange) — the bandedFlat trick
    val p = docs.sparkSession.sessionState.conf.numShufflePartitions
    val cold = grams.join(
      grams.groupBy(col("gh"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .where(col("df") <= maxDf).select(col("gh")),
      "gh")
      .repartition(p, col("gh"))
    val hits = cold.select(col("gh"), col("doc_id").as("doc_a"), col("pos").as("pos_a"))
      .join(cold.select(col("gh"), col("doc_id").as("doc_b"), col("pos").as("pos_b")),
        "gh")
      .where(col("doc_a") < col("doc_b"))
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a"))
    hits.withColumn("diag", col("pos_a") - col("pos_b"))
      .withColumn("island", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("island"))
      .agg(min(col("pos_a")).as("start_a"), min(col("pos_b")).as("start_b"),
        (max(col("pos_a")) - min(col("pos_a")) + k).as("len_tokens"))
      .select(col("doc_a"), col("doc_b"),
        col("start_a").cast("long").as("start_a"),
        col("start_b").cast("long").as("start_b"),
        col("len_tokens").cast("long").as("len_tokens"))
  }
}
