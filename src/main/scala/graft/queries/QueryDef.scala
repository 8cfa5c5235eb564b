package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator from SURVEY.md §2: a Spark-first implementation
  * plus (when SQL-expressible) an equivalent DuckDB oracle query run by
  * the driver over the same parquet tables.
  *
  * Determinism contract (drives the driver's hash compare, see
  * repo:Verify.scala): every query ends in a total ORDER BY on both
  * sides; float aggregation goes through exact DECIMAL intermediates so
  * partial-aggregation order (Spark) vs morsel order (DuckDB) cannot
  * change the result; column names are aliased identically on both
  * sides.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryDef {
  def q(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))
  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def qNoOracle(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
