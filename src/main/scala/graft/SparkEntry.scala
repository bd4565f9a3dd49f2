package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{LlmOps, Parity, Relational, SqlSurface, StreamSync}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory: reference-parity operators
  * (graft.queries.Parity), the relational surface (graft.queries.Relational),
  * and the LLM-pipeline operators (graft.queries.LlmOps). Each entry with an
  * exactly-SQL-expressible semantics also appears in `oracleSql` for the
  * driver's DuckDB hash-compare; LSH/ANN entries are rows-only by design.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Parity.queries ++ Relational.queries ++ LlmOps.queries ++ SqlSurface.queries ++
      StreamSync.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Parity.oracleSql ++ Relational.oracleSql ++ LlmOps.oracleSql ++ SqlSurface.oracleSql ++
      StreamSync.oracleSql
}
