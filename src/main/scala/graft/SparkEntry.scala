package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The queries/oracle registry is assembled from the per-area modules;
  * each entry is one declared operator from SURVEY §2 (or the
  * training-data-pipeline extension surface).
  */
object SparkEntry {

  /** All declared operators, in module order. */
  lazy val defs: Seq[QueryDef] =
    CoreQueries.all ++ FunctionQueries.all ++ FunctionQueries.trig ++ AggQueries.all ++ WindowQueries.all ++ SubqueryQueries.all ++ EventQueries.all ++ DedupQueries.all ++ VectorQueries.all ++ TextQueries.all ++ MultimodalQueries.all ++ PipelineQueries.all ++ DialectQueries.all ++ TpchQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    defs.head.run(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
