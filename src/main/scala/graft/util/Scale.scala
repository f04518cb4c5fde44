package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale toolkit: the shuffle-avoidance techniques the 100 TB plan
  * leans on beyond what AQE does automatically.
  */
object Scale {

  /** Write `df` as a bucketed+sorted table. Two tables bucketed the same
    * way on the join key co-locate: the join reads bucket i against
    * bucket i with NO exchange on either side — the Spark analog of the
    * reference pre-sorting its Aria tables on the index key
    * (`1_initial_load.py:184-185`). Verified plan-level in ScaleSpec.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Deterministically salted equi-join for skewed keys: the big side's
    * rows spread across `factor` sub-keys via a content hash (no rand()
    * — results stay reproducible), the small side replicates `factor`
    * times. One hot key becomes `factor` shuffle partitions instead of
    * one straggler task. AQE's skew-join split handles moderate skew on
    * its own; this is the explicit tool for the pathological tail.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(hash(struct(big.columns.map(col): _*)), lit(factor)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
