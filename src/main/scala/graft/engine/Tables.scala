package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Fixture-table access. The reference addresses tables as `schema.table`
  * with default schema `main` (reference pg_conn.go:548-556); here every
  * driver-generated parquet table (TESTDATA.md) is exposed both as a
  * DataFrame and as a temp view so DataFrame-API and SQL queries see the
  * same catalog. Views are registered once per (session, sfDir).
  *
  * Scale notes: these are plain parquet scans — Catalyst pushes filters
  * and prunes columns into the `FileSourceScanExec`, so the same code
  * works unchanged against a multi-TB directory; nothing here collects
  * to the driver.
  */
final case class Tables(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    events: DataFrame,
    documents: DataFrame,
    embeddings: DataFrame
)

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val registered = TrieMap.empty[String, Tables]

  /** Load (and cache the registration of) all fixture tables in sfDir. */
  def apply(spark: SparkSession, sfDir: String): Tables =
    registered.getOrElseUpdate(s"${System.identityHashCode(spark)}:$sfDir", {
      // the driver may hand us a session built without GraftSession —
      // the nanos-timestamp fixture needs this conf or the read throws
      // before normalization (it is runtime-settable)
      try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Throwable => }
      try spark.conf.set("spark.sql.session.timeZone", "UTC")
      catch { case _: Throwable => }
      val dfs = names.map { n =>
        val raw = spark.read.parquet(s"$sfDir/$n.parquet")
        // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
        // reader rejects; the session sets
        // spark.sql.legacy.parquet.nanosAsLong=true (see GraftSession) so
        // it arrives as Long nanos — normalize to timestamp_ntz in µs
        // (integer division: exact; DuckDB truncates ns→µs the same way).
        val df =
          if (n == "events" && raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
            raw.withColumn("ts",
              org.apache.spark.sql.functions.timestamp_micros(
                org.apache.spark.sql.functions.expr("ts div 1000"))
                .cast("timestamp_ntz"))
          else raw
        df.createOrReplaceTempView(n)
        n -> df
      }.toMap
      Tables(
        dfs("region"), dfs("nation"), dfs("customer"), dfs("supplier"),
        dfs("part"), dfs("orders"), dfs("lineitem"), dfs("events"),
        dfs("documents"), dfs("embeddings"))
    })
}
