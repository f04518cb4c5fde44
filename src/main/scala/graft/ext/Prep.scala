package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The INCREMENTAL data-prep composition: one new batch of raw
  * documents pushed through the full gate chain a continuously-ingesting
  * training pipeline runs — quality gate → dedup against the existing
  * corpus → eval-set decontamination → split assignment → token-budget
  * mixing — before its survivors are appended. Every stage is an
  * already-verified operator (q37/q38 gate, q73 dedupAgainst, q54
  * decontaminate, q51 splits, q117 budget mix); this object is their
  * composition, registered as q122 (batch form, DuckDB-oracle-chained)
  * and wired into streaming by
  * [[graft.streaming.StreamIngest.ingestPrep]].
  *
  * Scale shape: the corpus side is PROBED, never rewritten — two
  * anti-join tiers keyed on content hash / LSH band (dedupAgainst's
  * contract), a broadcast eval-shingle semi-join, then batch-local
  * narrow filters and one window exchange for the budget. Per-batch
  * cost scales with the batch and its collisions, not corpus lifetime.
  */
object Prep {

  /** Clean `batch` for appending: quality + language gate, exact+near
    * dedup against `corpus` (None = first batch, nothing to probe),
    * decontaminate against `evalDocs`, keep the train split, then cut
    * each language to its token budget. Emits
    * (doc_id, lang_guess, n_tokens, text) — text rides through so the
    * appended corpus can itself be probed by the next batch.
    */
  def prepBatch(batch: DataFrame, corpus: Option[DataFrame],
                evalDocs: DataFrame, budgets: Seq[(String, Long)],
                defaultBudget: Long, n: Int = 3): DataFrame = {
    val scored = TextAnalysis.qualityScore(batch)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .join(batch.select(col("doc_id"), col("text"),
        TextAnalysis.langGuessExpr(col("text")).as("lang_guess")), "doc_id")
      .where(col("quality_score") >= 0.55 && col("n_tokens") >= 20)
    val deduped = corpus match {
      case Some(c) => Dedup.dedupAgainst(scored, c, n)
      case None => scored
    }
    val cleaned = Dedup.decontaminate(deduped, evalDocs, n)
    val train = Sampling.assignSplits(cleaned, "doc_id")
      .where(col("split") === "train")
    Sampling.sampleToTokenBudget(
      train.select(col("doc_id"), col("lang_guess"), col("n_tokens"), col("text")),
      "doc_id", "lang_guess", "n_tokens", budgets, defaultBudget)
  }

  /** Filter-funnel audit: WHY documents are dropped, not just which
    * survive. Every per-row gate signal (language guess, token count,
    * repetition stats, PII match counts) is computed in ONE corpus scan
    * ([[TextAnalysis.cleanSignals]] with PII `extras`), each document
    * is attributed to its FIRST failing rule in fixed priority order —
    * lang_mismatch → too_short → repetitive → pii → kept, the exclusive
    * attribution a release report needs to sum to the corpus total —
    * and the result rolls up to (lang, reason, n_docs, n_tokens).
    *
    * All predicates are exact-integer (the repetition threshold is the
    * cross-multiplied `top_rep · 20 ≥ n_grams`, i.e. rep_ratio ≥ 0.05 —
    * the complement of q91's keep rule, so funnel "repetitive" +
    * q91-kept partition the corpus consistently). One scan + one
    * metadata-sized rollup exchange: the audit costs one pass at any
    * corpus size.
    */
  def filterFunnel(docs: DataFrame, minTokens: Int = 25): DataFrame = {
    val piiCounts = TextAnalysis.PiiPatterns.map { case (name, re, _) =>
      regexp_count(col("text"), lit(re)).cast("long").as(s"n_$name") }
    val sig = TextAnalysis.cleanSignals(docs, extras = piiCounts)
    val reason = when(col("lang_guess") =!= col("lang"), "lang_mismatch")
      .when(col("n_tokens") < minTokens, "too_short")
      .when(col("n_grams") > 0 && col("top_rep") * 20 >= col("n_grams"),
        "repetitive")
      .when(col("n_email") + col("n_ip") + col("n_phone") > 0, "pii")
      .otherwise("kept")
    sig.select(col("lang"), reason.as("reason"), col("n_tokens"))
      .groupBy(col("lang"), col("reason"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
  }
}
