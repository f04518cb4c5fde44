package graft.mart

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted inverted-index text-search mart — the analog of the
  * reference's FULLTEXT index on the tweets mart
  * (`4_create_tweets_a.py:35`): instead of rescanning document text per
  * search, a (token, doc_id, tf) relation is materialized once and
  * every lookup is an index probe.
  *
  * Scale shape: [[build]] is one explode + one hash aggregate (shuffle
  * key = (token, doc_id)); [[persist]] lays the index out repartitioned
  * BY TOKEN and sorted within partitions, so a term lookup over the
  * parquet mart prunes row groups via token min/max statistics and a
  * hot token's postings are one contiguous run. [[search]] is a
  * conjunctive probe: filter on the query terms (pushed to the scan),
  * then one aggregate — never a text rescan.
  */
object TextIndex {

  /** (token, doc_id, tf) — whitespace tokens, empties dropped. */
  def build(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Materialize an index clustered by its term column (K8/K9 layout:
    * columnar, co-located postings, min/max-prunable) — `token` for
    * [[build]], `tri` for [[trigramIndex]]. */
  def persist(index: DataFrame, path: String, cluster: String = "token"): Unit =
    index.repartition(col(cluster))
      .sortWithinPartitions(col(cluster), col("doc_id"))
      .write.mode("overwrite").parquet(path)

  /** Docs containing ALL `terms`, with total hit count — the
    * `MATCH ... AGAINST` analog over the index relation (works the same
    * against [[build]]'s output or a [[persist]]ed mart read back). */
  def search(index: DataFrame, terms: Seq[String]): DataFrame =
    index.where(col("token").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("token")).as("_nt"), sum(col("tf")).as("hits"))
      .where(col("_nt") === terms.size)
      .select(col("doc_id"), col("hits"))

  /** tf·idf-ranked disjunctive search (the `MATCH ... AGAINST` relevance
    * mode): docs containing ANY query term, scored by
    * Σ_terms tf · ((N·1000) div df) and ranked top-k.
    *
    * The idf is the integer-scaled rarity weight (N = corpus document
    * count, df = docs containing the term, both derived from the index
    * itself) — scoring is exact long arithmetic, so ranking is
    * deterministic under any partitioning and SQL-reproducible. The
    * probe touches only the query terms' postings (pushed to the scan on
    * a [[persist]]ed mart); df/N are aggregates OF THE POSTINGS/index,
    * never a corpus rescan, and the final top-k is a rank-limit
    * (TakeOrdered — per-partition heads, no global sort materialized).
    */
  def rankedSearch(index: DataFrame, terms: Seq[String], topK: Int): DataFrame = {
    val postings = index.where(col("token").isin(terms: _*))
    val docFreq = postings.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = index.agg(countDistinct(col("doc_id")).as("n_docs"))
    val scored = postings
      .join(broadcast(docFreq), "token")
      .join(broadcast(nDocs))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * expr("(n_docs * 1000L) div df")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
    // rank assignment over the ≤ topK surviving rows — bounded input,
    // the single-partition window is deliberate
    scored.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))).cast("long"))
  }

  /** Per-document top-k tf·idf KEYWORDS — extraction, not retrieval:
    * where [[rankedSearch]] scores documents for a query's terms, this
    * scores every token of every document against the corpus and keeps
    * each document's k most distinctive ones (tagging / labeling /
    * dataset-card color). Scoring reuses rankedSearch's exact-integer
    * idf (`(n_docs·1000) div df` — deterministic under any
    * partitioning, SQL-reproducible); ties break on token BYTES (the
    * bpeVocab collation discipline) so the cutoff agrees cross-engine
    * on non-ASCII vocabularies.
    *
    * Scale shape: df is one map-side-partial aggregate of the index;
    * the score join is a token-keyed equi-join of the index against
    * its own (vocabulary-sized) df relation; n_docs broadcasts one
    * row; the per-doc window is rank-limited (WindowGroupLimit) so at
    * most k rows per document survive the top-k filter.
    */
  def tfidfKeywords(index: DataFrame, topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val docFreq = index.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = index.agg(countDistinct(col("doc_id")).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token").cast("binary"))
    index.join(docFreq, "token")
      .join(broadcast(nDocs))
      .withColumn("score", col("tf") * expr("(n_docs * 1000L) div df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("doc_id"), col("token"), col("score"), col("rank"))
  }

  /** BM25-ranked disjunctive search — [[rankedSearch]]'s scoring
    * upgraded with the saturation + length normalization real IR
    * ranking needs (long docs stop winning on raw tf), in EXACT INTEGER
    * arithmetic so ranking is deterministic under any partitioning and
    * SQL-reproducible.
    *
    * Spec (k1 = 6/5, b = 3/4, integer-idf variant): with
    * N = corpus docs, TL = corpus tokens, A = (10·TL) div N (scaled
    * average doc length), dl = doc tokens, idf = (N·1000) div df:
    *
    *   score(d) = Σ_t (idf·22·tf·A) div (10·A·tf + 3·A + 90·dl)
    *
    * which is idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) scaled
    * through by 10·A — the textbook BM25 term, floor-divided once per
    * term. The per-term products (idf·22·tf·A, 10·A·tf) are computed in
    * DECIMAL(38,0): long arithmetic overflows silently past ~10⁷ docs
    * at these idf/len scales, while 38 digits hold any physical corpus
    * (idf ≤ 10³·N, tf ≤ TL, A ≤ 10·TL/N ⇒ the product is maximized by
    * one giant doc, ≈ 22·10³·N·TL·(10·TL/N) ≈ 10³⁷ even at TL = 10¹⁶
    * tokens — a 100 TB corpus in one document). The floor DIVISION
    * result is long again (`div` on decimals yields BIGINT), so the
    * emitted score type and every downstream shape are unchanged — the
    * FORMULA is the contract, verified by the q96 oracle generated from
    * the same constants, and the overflow regime by a BigInt-replay spec
    * (TextIndexSpec) on a corpus long arithmetic cannot score.
    *
    * Scale shape: doc lengths are one hash aggregate of the index
    * (map-side partials); the probe touches only the query terms'
    * postings (pushed to a [[persist]]ed mart's scan) and joins the
    * corpus-sized length relation on doc_id — the postings side is
    * query-sized, so AQE broadcasts it. df/N/TL are aggregates of the
    * index itself, broadcast back one row; top-k is a rank-limit
    * (TakeOrdered), never a global sort.
    */
  def bm25Search(index: DataFrame, terms: Seq[String], topK: Int): DataFrame = {
    val docLen = index.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = index.agg(countDistinct(col("doc_id")).as("n_docs"),
      sum(col("tf")).as("tl"))
    val postings = index.where(col("token").isin(terms: _*))
    val docFreq = postings.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val scored = postings
      .join(broadcast(docFreq), "token")
      .join(docLen, "doc_id")
      .join(broadcast(stats))
      .withColumn("idf", expr("(n_docs * 1000L) div df"))
      .withColumn("a", expr("(10L * tl) div n_docs"))
      .groupBy(col("doc_id"))
      .agg(sum(expr(
        """(cast(idf AS DECIMAL(38,0)) * 22 * tf * a)
          | div (cast(10 AS DECIMAL(38,0)) * a * tf + 3 * a + 90 * dl)""".stripMargin))
        .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
    // rank assignment over the ≤ topK surviving rows — bounded input,
    // the single-partition window is deliberate
    scored.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))).cast("long"))
  }

  /** Reciprocal-rank fusion of ranked retrieval lists — the standard
    * way hybrid search combines heterogeneous rankers (BM25 + vector
    * ANN, or any (doc_id, rank) relations): each list contributes
    * 1/(kRrf + rank) per document and the fused score sums the
    * contributions, so agreement across rankers beats a high rank in
    * one. Kept exact-integer (contribution = SCALE div (kRrf + rank),
    * SCALE = 10⁶) so fusion is deterministic and SQL-reproducible.
    *
    * Scale shape: a unionByName of the (already top-k-bounded) input
    * lists, one hash aggregate on doc_id, then a rank-limit — each
    * input is ≤ its own topK rows, so the fusion stage is query-sized
    * regardless of corpus size.
    */
  def rrfFuse(rankings: Seq[DataFrame], kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty && kRrf >= 0)
    val fused = rankings
      .map(_.select(col("doc_id"),
        expr(s"1000000L div (${kRrf}L + rank)").as("c")))
      .reduce(_ unionByName _)
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("rrf_score"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(topK)
    fused.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("rrf_score").desc, col("doc_id"))).cast("long"))
  }

  /** Character-trigram index: (tri, doc_id) distinct pairs — the infix-
    * search companion to the token index (a token index cannot answer
    * `LIKE '%substr%'`; a trigram index can, because every document
    * containing a needle contains every trigram of the needle). Same
    * K8/K9 persistence story as [[build]]: cluster by `tri` via
    * [[persist]] (rename token→tri) for min/max-prunable probes. */
  def trigramIndex(docs: DataFrame): DataFrame =
    docs
      .where(length(col("text")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), length(col("text")) - 2),
          i => col("text").substr(i, lit(3))))).as("tri"))

  /** Exact substring search driven by the trigram index: candidate docs
    * must contain ALL of the needle's distinct trigrams (a conjunctive
    * index probe, never a corpus text scan), then the needle itself is
    * confirmed against the candidates' text only. Emits
    * (doc_id, hits = occurrence count). Requires needle length ≥ 3 —
    * shorter needles have no trigram and would need a full scan.
    *
    * Scale shape: the probe touches |needle| postings lists; the
    * confirm joins the candidate id set (semi-join-sized) back to the
    * corpus — selectivity comes from the rarest trigram, exactly like
    * a database trigram index (pg_trgm).
    */
  def substringSearch(triIndex: DataFrame, docs: DataFrame,
                      needle: String): DataFrame = {
    require(needle.length >= 3, "needle must be at least 3 chars")
    val tris = needle.sliding(3).toSeq.distinct
    val candidates = triIndex.where(col("tri").isin(tris: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("_nt"))
      .where(col("_nt") === tris.size)
      .select(col("doc_id"))
    docs.join(candidates, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        ((length(col("text"))
          - length(call_function("replace", col("text"), lit(needle), lit(""))))
          / needle.length).cast("long").as("hits"))
      .where(col("hits") > 0)
  }

  /** Tokenizer-vocabulary induction: corpus token frequencies pruned to
    * `minCount` and capped at the `maxSize` most frequent, with dense
    * 0-based ids in (count desc, token) order — the "train a vocab over
    * the cleaned corpus" step of an LLM data pipeline.
    *
    * Scale shape: one hash aggregate over the index (partial counts
    * map-side), then a rank-limit top-`maxSize` (TakeOrdered — no global
    * sort). Id assignment windows over ≤ maxSize rows, which is bounded
    * by construction (a vocabulary is driver-sized; the corpus is not).
    */
  def vocabulary(index: DataFrame, minCount: Long, maxSize: Int): DataFrame =
    index.groupBy(col("token"))
      .agg(sum(col("tf")).as("count"))
      .where(col("count") >= minCount)
      .orderBy(col("count").desc, col("token"))
      .limit(maxSize)
      .withColumn("token_id",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("count").desc, col("token"))) - 1).cast("long"))
}
