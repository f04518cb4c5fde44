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
