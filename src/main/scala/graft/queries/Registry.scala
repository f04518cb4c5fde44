package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator-query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle the driver
  * hash-compares against. Column names/aliases MUST match between the two
  * — the driver sorts columns by name before hashing values.
  *
  * FP-determinism conventions used throughout the registry (hash compare
  * is exact, so floating-point summation order must not matter):
  *  - money/value sums go through integer cents:
  *    `sum(cast(round(x*100) as bigint))` — exact in any order;
  *  - integer-valued doubles (l_quantity) may be summed directly;
  *  - emitted doubles are either raw column values or a fixed expression
  *    tree over already-exact values (identical IEEE ops in both engines).
  */
case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object Q {
  def apply(fn: (SparkSession, String) => DataFrame, oracle: String): Q =
    Q(fn, Some(oracle))
}
