package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines:
  * held-out train/val/test splits and per-stratum downsampling, both
  * driven by the cross-engine md5-prefix hash of a salted id (so the
  * same row lands in the same split on any engine, any run, any
  * partitioning — the property `rand()`-based sampling lacks).
  *
  * Scale shape: a pure narrow projection/filter per row — no shuffle,
  * no state; the salt string makes independent samples ("split" vs a
  * later "ablation" sample) statistically unrelated.
  */
object Sampling {

  /** bucket in [0, 100): hash64("salt:id") % 100 (hash is 60-bit
    * non-negative, so % is safe in both engines). */
  def bucket(df: DataFrame, id: Column, salt: String): Column = {
    graft.functions.Md5Prefix64.register(df.sparkSession)
    Dedup.hash64(concat(lit(salt + ":"), id.cast("string"))) % 100
  }

  /** The identical bucket in DuckDB SQL — oracle building block. */
  def bucketSql(idExpr: String, salt: String): String =
    s"cast(concat('0x', substr(md5(concat('$salt:', cast($idExpr AS VARCHAR))), 1, 15)) AS BIGINT) % 100"

  /** Adds a `split` column: 'train' for bucket < trainPct, 'val' for
    * the next valPct buckets, 'test' for the rest. */
  def assignSplits(df: DataFrame, idCol: String, trainPct: Int = 80,
                   valPct: Int = 10, salt: String = "split"): DataFrame = {
    val b = bucket(df, col(idCol), salt)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Keeps each row with probability ratePct(stratum)/100 (deterministic
    * by hash); strata not in the map use defaultPct. Rates are applied
    * per stratum value — the standard rebalancing step (e.g. downsample
    * over-represented languages) ahead of training. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       ratePct: Seq[(String, Int)], defaultPct: Int,
                       salt: String = "strat"): DataFrame = {
    val rate = ratePct.foldLeft(lit(defaultPct)) { case (acc, (v, p)) =>
      when(col(stratumCol) === v, p).otherwise(acc)
    }
    df.where(bucket(df, col(idCol), salt) < rate)
  }

  /** Oracle CASE expression matching [[stratifiedSample]]'s rate fold. */
  def rateSql(stratumExpr: String, ratePct: Seq[(String, Int)],
              defaultPct: Int): String =
    ratePct.foldLeft(defaultPct.toString) { case (acc, (v, p)) =>
      s"(CASE WHEN $stratumExpr = '$v' THEN $p ELSE $acc END)"
    }

  /** Keeps each row with probability `weightPct`/100 where the weight is
    * any per-row integer expression in [0, 100] (quality score, length
    * tier, source trust) — importance sampling with the same
    * deterministic-hash contract as the other samplers: per-row stable
    * under any subset/partitioning, reproducible cross-engine. Rows at
    * weight 100 always survive; weight 0 never does. Pure narrow
    * filter, zero shuffles. */
  def weightedSample(df: DataFrame, idCol: String, weightPct: Column,
                     salt: String = "weight"): DataFrame =
    df.where(bucket(df, col(idCol), salt) < weightPct)
}
