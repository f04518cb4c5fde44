package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, ExtQueries, GraphQueries, Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is registered here as a named query
  * over the driver testdata; where the semantics are SQL-expressible the
  * matching DuckDB oracle lives next to the Spark implementation (in
  * graft.queries.*) and is surfaced via [[oracleSql]].
  */
object SparkEntry {

  private def registry: Seq[(String, Q)] =
    CoreQueries.all ++ GraphQueries.all ++ ExtQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.toMap.apply("q01_conv_rollup").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, Q(_, Some(sql))) => name -> sql }.toMap
}
