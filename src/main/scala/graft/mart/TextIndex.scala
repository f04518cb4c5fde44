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

  /** Materialize the index clustered by token (K8/K9 layout: columnar,
    * co-located postings, min/max-prunable). */
  def persist(index: DataFrame, path: String): Unit =
    index.repartition(col("token"))
      .sortWithinPartitions(col("token"), col("doc_id"))
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
}
