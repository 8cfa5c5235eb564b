package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming correctness: run each streaming transform over the events
  * fixture via the file source + memory sink, and compare with the
  * equivalent batch computation on the same data — the streaming and
  * batch answers must agree once the stream is fully consumed.
  */
class StreamingSpec extends SparkSpecBase {

  private def eventsDir: String = {
    // copy the fixture parquet into a directory (streaming file source
    // reads directories, and testdata is read-only)
    val dir = java.nio.file.Files.createTempDirectory("graft-events").toFile
    dir.deleteOnExit()
    val batch = graft.engine.Tables(spark, sf).events
    // one file ⇒ one AvailableNow micro-batch ⇒ deterministic per-group
    // arrival order (multi-file drops would arrive in file order, which
    // the stateful merge handles per batch but the test shouldn't
    // depend on)
    batch.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(dir.getAbsolutePath)
    dir.getAbsolutePath
  }

  test("watermarked hourly windows match the batch aggregation") {
    val dir = eventsDir
    val q = EventStreams.hourlyCounts(EventStreams.readEventStream(spark, dir))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode only emits windows the watermark has closed; with a
    // single batch the watermark advances at the end, so closed windows
    // = all but the final 2 hours of data. Compare on the closed set.
    val streamed = spark.table("hourly")
    val batch = spark.read.parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,6)")).as("total"))
      .select(col("window.start").as("hr"), col("event_type"), col("n"), col("total"))
    val maxClosed = streamed.agg(max(col("hr"))).head().getTimestamp(0)
    assert(streamed.count() > 0, "stream emitted no closed windows")
    val b = batch.filter(col("hr") <= maxClosed)
    val s = streamed
    assert(s.exceptAll(b).isEmpty && b.exceptAll(s).isEmpty,
      s"stream/batch divergence: stream=${s.count()} batch=${b.count()}")
  }

  test("stateful sessionization emits gap-closed sessions matching batch") {
    import spark.implicits._
    val dir = eventsDir
    val events = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"))
      .parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Event]
    val q = EventStreams.sessions(events)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("sessions")
      .select(col("user_id"), col("sess_start").cast("timestamp_ntz").as("sess_start"),
        col("n_events"))
    assert(streamed.count() > 0, "no sessions emitted")

    // batch equivalent (same shape as q_evt_session)
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batchSessions = spark.read.parquet(dir)
      .withColumn("new_sess",
        when(col("ts") - lag(col("ts"), 1).over(byUser) > expr("INTERVAL 30 MINUTE")
          || lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(byUser))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).cast("int").as("n_events"), min(col("ts")).as("sess_start"))
      .select(col("user_id"), col("sess_start"), col("n_events"))

    // every streamed (closed) session must exist identically in batch
    val missing = streamed.join(batchSessions,
      Seq("user_id", "sess_start", "n_events"), "left_anti")
    assert(missing.isEmpty,
      s"sessions not in batch: ${missing.collect().take(5).mkString(", ")}")
  }

  test("streaming exact dedup drops duplicates within the watermark") {
    // fixture written TWICE into one file: every digest occurs >= 2x
    val dir = java.nio.file.Files.createTempDirectory("graft-dup-events").toFile
    dir.deleteOnExit()
    val batch = graft.engine.Tables(spark, sf).events
    batch.unionAll(batch).orderBy("ts").coalesce(1)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val q = EventStreams.dedupExact(EventStreams.readEventStream(spark, dir.getAbsolutePath))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("dedup")
    val distinctDigests = spark.read.parquet(dir.getAbsolutePath)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(md5(concat_ws("|", col("user_id"), col("event_type"), col("value"), col("ts"))))
      .distinct().count()
    assert(streamed.count() == distinctDigests,
      s"stream kept ${streamed.count()} rows, expected $distinctDigests distinct digests")
    assert(streamed.select(col("digest")).distinct().count() == streamed.count(),
      "stream emitted duplicate digests")
  }

  test("streaming near-dup candidates equal the batch min-star pair set") {
    // documents stream: synthesize an ingest timestamp from doc_id
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toFile
    dir.deleteOnExit()
    val docs = graft.engine.Tables(spark, sf).documents
      .select(col("doc_id"), col("text"),
        (lit(1700000000L) + col("doc_id")).cast("timestamp").as("ts"))
    docs.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(dir.getAbsolutePath)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, ts TIMESTAMP")
    val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
    val q = EventStreams.nearDupCandidates(stream)
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("neardup")
      .select(col("doc_id"), col("first_doc")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch reference: the same signature arithmetic (minhashBands)
    // gives the bucket table; the stream must emit EXACTLY the min-star
    // pairs — for each bucket with >= 2 docs, (other, min) per other
    val starPairs = graft.queries.DedupQueries.minhashBands(docs)
      .groupBy(col("band"), col("bkey"))
      .agg(min(col("doc_id")).as("m"), collect_set(col("doc_id")).as("ds"))
      .select(explode(col("ds")).as("d"), col("m"))
      .filter(col("d") =!= col("m"))
      .select(col("d"), col("m")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty, "fixture contains near-dups; stream emitted none")
    assert(streamed == starPairs,
      s"stream/batch star-pair mismatch: stream-only=${(streamed -- starPairs).take(3)} " +
        s"batch-only=${(starPairs -- streamed).take(3)}")
  }

  test("near-dup state survives a restart: second run dedups against checkpointed buckets") {
    // run 1 ingests the corpus; run 2 (a NEW query restarted from the
    // same checkpoint) ingests byte-identical re-uploads with fresh
    // doc_ids. Every re-upload must be flagged against the FIRST run's
    // admitted docs — proof the bucket state lives in the checkpointed
    // state store, not the JVM.
    val dir = java.nio.file.Files.createTempDirectory("graft-docs-ckpt").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    dir.deleteOnExit(); ckpt.deleteOnExit()
    val base = graft.engine.Tables(spark, sf).documents
      .select(col("doc_id"), col("text"),
        (lit(1700000000L) + col("doc_id")).cast("timestamp").as("ts"))
    base.orderBy("doc_id").coalesce(1)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, ts TIMESTAMP")
    // memory sink cannot recover from a checkpoint; the parquet file
    // sink can — which is also the realistic shape (pair stream landed
    // to storage for the downstream keep/drop job)
    val outDir = java.nio.file.Files.createTempDirectory("graft-neardup-out").toFile
    outDir.deleteOnExit()
    def runOnce(): Unit = {
      val q = EventStreams.nearDupCandidates(
          spark.readStream.schema(schema).parquet(dir.getAbsolutePath))
        .writeStream.format("parquet")
        .option("path", outDir.getAbsolutePath)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce()
    // re-uploads: same text, doc_id offset far above run 1, slightly
    // later event time (still inside the watermark horizon)
    base.select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        (col("ts").cast("long") + 60).cast("timestamp").as("ts"))
      .orderBy("doc_id").coalesce(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    runOnce()
    val run2 = spark.read.parquet(outDir.getAbsolutePath)
      .select(col("doc_id"), col("first_doc")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val flaggedReuploads = run2.filter { case (d, f) => d >= 1000000L && f < 1000000L }
      .map(_._1 - 1000000L).toSet
    val nDocs = base.count()
    assert(flaggedReuploads.size == nDocs,
      s"only ${flaggedReuploads.size} of $nDocs re-uploads were flagged against " +
        "run-1 state after restart — bucket state did not survive the checkpoint")
  }

  test("streaming quality gate matches the batch scorer and meters every doc") {
    val dir = java.nio.file.Files.createTempDirectory("graft-qgate").toFile
    dir.deleteOnExit()
    // 10-minute ingest spacing spreads the corpus over ~3 days of event
    // time, so append mode has closed windows to emit (all but the
    // final watermark horizon)
    val docs = graft.engine.Tables(spark, sf).documents
      .select(col("doc_id"), col("text"), col("source"),
        (lit(1700000000L) + col("doc_id") * 600).cast("timestamp").as("ts"))
    docs.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(dir.getAbsolutePath)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING, ts TIMESTAMP")
    val q = EventStreams.qualityGate(
        spark.readStream.schema(schema).parquet(dir.getAbsolutePath))
      .writeStream.format("memory").queryName("qgate")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("qgate")
      .select(col("hr"), col("source"), col("n_docs"), col("n_admitted"), col("admitted_toks"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(streamed.nonEmpty, "stream emitted no closed windows")
    // append mode emits only watermark-closed windows; compare the
    // batch reference (SAME score definition) on the closed set
    val maxClosed = streamed.keys.map(_._1.getTime).max
    val score = graft.queries.PipelineQueries.qualityScore
    val batch = docs
      .withColumn("keep", score >= 0.5)
      .withColumn("toks", size(split(col("text"), " ")).cast("long"))
      .groupBy(window(col("ts"), "1 hour"), col("source"))
      .agg(count(lit(1)).as("n"), sum(when(col("keep"), 1L).otherwise(0L)).as("a"),
        sum(when(col("keep"), col("toks")).otherwise(0L)).as("at"))
      .collect()
      .map(r => (r.getStruct(0).getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .filter(_._1._1.getTime <= maxClosed).toMap
    assert(streamed == batch,
      s"stream/batch metering mismatch: stream=${streamed.size} batch=${batch.size} rows")
    // closed-window accounting covers every doc outside the final horizon
    val metered = streamed.values.map(_._1).sum
    val expected = docs.filter(
      col("ts") < new java.sql.Timestamp(maxClosed + 3600 * 1000L)).count()
    assert(metered == expected, s"metered $metered docs of $expected in closed windows")
  }
}
