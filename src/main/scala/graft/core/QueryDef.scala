package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark build function over a testdata dir plus an
  * optional DuckDB oracle SQL producing the identical result (same column
  * names — the driver's compare sorts columns by name before hashing).
  * Queries without an SQL-expressible oracle (sketches, approximate ops)
  * leave `oracle` empty and get a weaker rows-only check.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(build: (SparkSession, String) => DataFrame, sql: String): QueryDef =
    QueryDef(build, Some(sql))
}
