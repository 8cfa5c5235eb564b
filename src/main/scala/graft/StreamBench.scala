package graft

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode

/** Streaming micro-bench (VERDICT r15 item 7): first perf evidence for
  * the `graft.streaming.EventStreams` operators, which had inherited
  * the batch specs' plan arguments but never their own measurement.
  *
  * Each operator streams the sfDir fixture through the file source into
  * the streaming noop sink (fresh checkpoint per rep) and reports
  * steady-state rows/sec = input rows / min-of-REPS wall seconds of
  * `processAllAvailable`. A warmup rep against the sf0.001 sibling
  * absorbs session/codegen/state-store cold start, mirroring Bench.
  * Run at two parallelism levels (SPARK_GRAFT_CPUS=32 / 8) to see
  * whether the stream side scales like the batch plans it mirrors.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.StreamBench"
  *
  * Prints ONE JSON line:
  *   {"metric":"stream_rows_per_sec","cpus":..,"ops":{..},"sf":".."}
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.EventStreams
    import org.apache.spark.sql.functions._

    val ckRoot = new File("target/streambench")
    def freshDir(name: String): String = {
      val d = new File(ckRoot, s"$name-${System.nanoTime()}")
      d.mkdirs(); d.getAbsolutePath
    }

    // documents stream: fixture schema + a deterministic event time
    // derived from doc_id (the fixture has no timestamp column)
    def docStream(dir: String): DataFrame = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      spark.readStream.schema(schema).parquet(s"$dir/documents.parquet")
        .withColumn("ts", timestamp_seconds(col("doc_id") % 7200))
    }

    // (name, rows-column source dir -> streaming frame, output mode)
    type Op = (String, String => DataFrame, OutputMode, String)
    val ops: Seq[Op] = Seq(
      // windowed aggregate over events: Update emits per micro-batch
      // (Append would hold rows until the watermark passes — this
      // bench measures processing, not emission latency)
      ("hourly_counts",
        (dir: String) => EventStreams.hourlyCounts(
          EventStreams.readEventStream(spark, s"$dir/events.parquet")),
        OutputMode.Update(), "events"),
      ("sessions",
        (dir: String) => {
          import spark.implicits._
          EventStreams.sessions(
            EventStreams.readEventStream(spark, s"$dir/events.parquet")
              .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
                col("user_id"), col("event_type"), col("value"))
              .as[EventStreams.Event]).toDF()
        },
        OutputMode.Append(), "events"),
      ("dedup_exact",
        (dir: String) => EventStreams.dedupExact(
          EventStreams.readEventStream(spark, s"$dir/events.parquet")),
        OutputMode.Append(), "events"),
      ("near_dup",
        (dir: String) => EventStreams.nearDupCandidates(docStream(dir)).toDF(),
        OutputMode.Append(), "documents"),
      ("quality_gate",
        (dir: String) => EventStreams.qualityGate(docStream(dir)),
        OutputMode.Update(), "documents"))

    def rowsOf(dir: String, table: String): Long =
      spark.read.parquet(s"$dir/$table.parquet").count()

    def runOnce(op: Op, dir: String): Double = {
      val (name, mk, mode, _) = op
      val q = mk(dir).writeStream.format("noop")
        .option("checkpointLocation", freshDir(name))
        .outputMode(mode).start()
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val dt = (System.nanoTime() - t0) / 1e9
      q.stop()
      dt
    }

    // warmup at the smallest sibling fixture (codegen/JIT/state store)
    val warmDir = {
      val small = new File(new File(sfDir).getParentFile, "sf0.001")
      if (small.isDirectory) small.getAbsolutePath else sfDir
    }
    ops.foreach { op =>
      try runOnce(op, warmDir)
      catch { case e: Throwable => System.err.println(s"[streambench warm] ${op._1}: $e") }
    }

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val results = ops.map { op =>
      val rows = rowsOf(sfDir, op._4)
      val secs = (1 to reps).map(_ => runOnce(op, sfDir)).min
      op._1 -> (rows / secs)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val line = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString(s"""{"metric":"stream_rows_per_sec","cpus":$cpus,"reps":$reps,"ops":{""",
        ",", s"""},"sf":"$sfDir"}""")
    println(line)
    spark.stop()
    println(line)
    System.out.flush()
  }
}
