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

  /** Restore scan parallelism for a CPU-heavy pipeline over a small
    * input: a sub-row-group parquet file scans as ONE task no matter
    * how small the split size, so md5 shingling / tokenization /
    * vector math over it runs single-threaded on a 32-core session.
    * When the scan already has enough partitions — any real multi-
    * file / multi-row-group layout, i.e. every at-scale deployment —
    * this is the IDENTITY and no exchange enters the plan, so the
    * 100 TB shape is untouched while the benchmark tier stops
    * serializing its dominant stage. The partition probe costs a
    * physical plan, not a job. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts =
      try df.queryExecution.executedPlan.execute().getNumPartitions
      catch { case _: Throwable => target }
    if (parts * 2 >= target) df else df.repartition(target)
  }

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
        // the text/vector corpus tables are consumed by CPU-heavy
        // pipelines (shingle md5, tokenization, dot products) whose
        // cost is orders of magnitude above their byte size — restore
        // scan parallelism here once so every consumer (DataFrame and
        // SQL view alike) gets it; identity on any at-scale layout
        // (r9 negative result: spreading the relational tables too was
        // measured 1.4-3x SLOWER across the TPC-H class — their pruned
        // scans decode fast and the added full-table exchange dwarfs
        // the serial-decode saving. Text/vector only.)
        val spreadDf =
          if (n == "documents" || n == "embeddings") spread(df) else df
        spreadDf.createOrReplaceTempView(n)
        n -> spreadDf
      }.toMap
      Tables(
        dfs("region"), dfs("nation"), dfs("customer"), dfs("supplier"),
        dfs("part"), dfs("orders"), dfs("lineitem"), dfs("events"),
        dfs("documents"), dfs("embeddings"))
    })
}
