package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle the driver runs
  * over the same parquet tables. Column names/aliases must match the
  * Spark output exactly — the driver sorts columns by name and hashes
  * values.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, None)
}
