package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: place every document at a deterministic offset
  * inside fixed-token-budget training sequences — the step that turns a
  * cleaned corpus into context-window-sized samples.
  *
  * Documents are sharded by a salted hash, ordered within the shard by
  * (hash, id) — a deterministic global shuffle — and laid end-to-end: a
  * running token total gives each document its start offset; dividing
  * by the sequence length yields the sequence id it starts in
  * (greedy concatenation; a document may straddle a boundary, the
  * standard pack-with-splitting scheme).
  *
  * Scale shape: ONE window partition per shard, so parallelism = shard
  * count — size `shards` to a few × the cluster's cores (each shard
  * streams its rows once through a running sum; no global sort, no
  * single-partition bottleneck). All arithmetic is integer and the
  * order key is unique, so results are engine-independent.
  */
object SeqPack {

  def pack(docs: DataFrame, idCol: String, textCol: String, shards: Int,
           seqLen: Int, salt: String = "pack"): DataFrame = {
    graft.functions.Md5Prefix64.register(docs.sparkSession)
    val h = Dedup.hash64(concat(lit(salt + ":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    docs
      .select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tok"), h.as("h"))
      .withColumn("shard", col("h") % shards)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col(idCol), col("shard"),
        expr(s"(cum - n_tok) div $seqLen").as("seq_id"),
        expr(s"(cum - n_tok) % $seqLen").as("offset"),
        col("n_tok"))
  }

  /** Materialize the ACTUAL packed training sequences that [[pack]]
    * only addresses: per (shard, seq_id), the concatenated token window
    * of up to `seqLen` tokens, cut across document boundaries — the
    * GPT-style pretraining sample layout. Every sequence except each
    * shard's last is exactly full (`n_tok_filled` = seqLen).
    *
    * Scale shape — FRAGMENTS, not tokens: each document splits narrowly
    * (per-row, zero exchanges) into ≤ ⌈n_tok/seqLen⌉ + 1 per-sequence
    * fragments, and the (shard, seq_id) assembly aggregate shuffles one
    * row per FRAGMENT — document-count-sized traffic. The naive
    * formulation (posexplode every token, group by token position)
    * shuffles seqLen× more rows; at a 4k context that is three orders
    * of magnitude. One window exchange (the [[pack]] layout, same salt
    * so q53 and q149 share arithmetic) + one assembly exchange.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shards: Int, seqLen: Int,
                    salt: String = "pack"): DataFrame = {
    require(shards > 0 && seqLen > 0,
      s"shards/seqLen must be positive, got $shards/$seqLen")
    graft.functions.Md5Prefix64.register(docs.sparkSession)
    val h = Dedup.hash64(concat(lit(salt + ":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    val laid = docs
      .select(col(idCol), split(col(textCol), " ").as("t"), h.as("h"))
      .withColumn("n_tok", size(col("t")).cast("long"))
      .withColumn("shard", col("h") % shards)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("start", col("cum") - col("n_tok"))
    val frags = laid
      .select(col("shard"), col("t"), col("start"), col("cum"),
        explode(sequence(expr(s"start div $seqLen"),
          expr(s"(cum - 1) div $seqLen"))).as("seq_id"))
      .select(col("shard"), col("seq_id"),
        (greatest(col("seq_id") * seqLen, col("start"))
          - col("seq_id") * seqLen).as("off"),
        expr(s"least((seq_id + 1) * $seqLen, cum)"
          + s" - greatest(seq_id * $seqLen, start)").as("flen"),
        expr(s"slice(t, cast(greatest(seq_id * $seqLen - start, 0) + 1 AS INT),"
          + s" cast(least((seq_id + 1) * $seqLen, cum)"
          + s" - greatest(seq_id * $seqLen, start) AS INT))").as("ft"))
    frags.groupBy(col("shard"), col("seq_id"))
      .agg(sum(col("flen")).as("n_tok_filled"),
        array_join(transform(
          array_sort(collect_list(struct(col("off"), col("ft")))),
          x => array_join(x.getField("ft"), " ")), " ").as("seq_text"))
  }

  /** [[packSequences]] replayed in DuckDB (oracle) — same hash, window,
    * fragment-boundary, and stitch arithmetic. */
  def packSequencesOracleSql(table: String, idCol: String, textCol: String,
                             shards: Int, seqLen: Int,
                             salt: String = "pack"): String = {
    val L = seqLen
    s"""WITH d AS (SELECT $idCol, string_split($textCol, ' ') AS t,
       |    cast(len(string_split($textCol, ' ')) AS BIGINT) AS n_tok,
       |    cast(concat('0x', substr(md5(concat('$salt:', cast($idCol AS VARCHAR))), 1, 15)) AS BIGINT) AS h
       |  FROM $table),
       |c AS (SELECT $idCol, t, h % $shards AS shard, n_tok,
       |    cast(sum(n_tok) OVER (PARTITION BY h % $shards ORDER BY h, $idCol)
       |         AS BIGINT) AS cum
       |  FROM d),
       |f AS (SELECT shard, t, cum, cum - n_tok AS start,
       |    unnest(range((cum - n_tok) // $L, (cum - 1) // $L + 1)) AS seq_id
       |  FROM c),
       |g AS (SELECT shard, seq_id,
       |    greatest(seq_id * $L, start) - seq_id * $L AS off,
       |    least((seq_id + 1) * $L, cum) - greatest(seq_id * $L, start) AS flen,
       |    array_to_string(t[cast(greatest(seq_id * $L - start, 0) + 1 AS BIGINT)
       |      :cast(least((seq_id + 1) * $L, cum) - start AS BIGINT)], ' ') AS ft
       |  FROM f)
       |SELECT shard, cast(seq_id AS BIGINT) AS seq_id,
       |  cast(sum(flen) AS BIGINT) AS n_tok_filled,
       |  string_agg(ft, ' ' ORDER BY off) AS seq_text
       |FROM g GROUP BY shard, seq_id""".stripMargin
  }

  /** The identical computation in DuckDB SQL (oracle). */
  def packOracleSql(table: String, idCol: String, textCol: String,
                    shards: Int, seqLen: Int, salt: String = "pack"): String =
    s"""WITH d AS (SELECT $idCol,
       |    cast(len(string_split($textCol, ' ')) AS BIGINT) AS n_tok,
       |    cast(concat('0x', substr(md5(concat('$salt:', cast($idCol AS VARCHAR))), 1, 15)) AS BIGINT) AS h
       |  FROM $table),
       |c AS (SELECT $idCol, h % $shards AS shard, n_tok,
       |    cast(sum(n_tok) OVER (PARTITION BY h % $shards ORDER BY h, $idCol)
       |         AS BIGINT) AS cum
       |  FROM d)
       |SELECT $idCol, shard, (cum - n_tok) // $seqLen AS seq_id,
       |       (cum - n_tok) % $seqLen AS offset, n_tok
       |FROM c""".stripMargin
}
