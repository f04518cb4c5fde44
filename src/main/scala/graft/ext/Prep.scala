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
}
