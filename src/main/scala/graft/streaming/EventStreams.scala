package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2-B.10 extension target — the
  * reference has no streaming semantics; this is the capability a
  * training-data pipeline adds on top): watermarked tumbling-window
  * aggregation and stateful gap sessionization over the events shape.
  *
  * Inputs arrive via any streaming source (file source over a parquet
  * drop directory here; Kafka on a real deployment — the plan is
  * source-agnostic). State lives in the checkpointed state store, so a
  * 1000-executor run shards session state by user_id with no driver
  * involvement.
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  // state keeps the original Timestamps — round-tripping through
  // epoch-millis would truncate microseconds
  case class SessionState(start: Timestamp, end: Timestamp, n: Int)
  case class Session(user_id: Long, sess_start: Timestamp, sess_end: Timestamp,
      n_events: Int)

  /** events stream from a parquet directory (schema must be supplied —
    * streaming sources cannot infer). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, " +
        "value DOUBLE, props STRING")
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Tumbling 1-hour windows per event_type with a 2-hour watermark:
    * late events beyond the watermark are dropped, window state is
    * evicted once the watermark passes — bounded state at any scale. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("total"))
      .select(col("window.start").as("hr"), col("event_type"), col("n"), col("total"))

  /** Gap-based sessionization (30-minute inactivity) with
    * flatMapGroupsWithState: one state entry per user, emitted and
    * cleared on timeout — the streaming analog of q_evt_session. */
  def sessions(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.end, s.n))
          } else {
            val evs = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            evs.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.end.getTime <= gapMs =>
                  val newEnd = if (e.ts.after(s.end)) e.ts else s.end
                  cur = Some(s.copy(end = newEnd, n = s.n + 1))
                case Some(s) =>
                  closed ::= Session(userId, s.start, s.end, s.n)
                  cur = Some(SessionState(e.ts, e.ts, 1))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end.getTime + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming exact dedup — the streaming analog of q_dedup_exact for
    * a continuously-ingesting training-data pipeline: first occurrence
    * of each content digest wins; duplicate state is evicted once the
    * event-time watermark passes, so state stays bounded by the
    * watermark horizon, not the stream's history. */
  def dedupExact(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .withColumn("digest",
        md5(concat_ws("|", col("user_id"), col("event_type"), col("value"), col("ts"))))
      .dropDuplicatesWithinWatermark("digest")

  case class BandRow(bkey: String, doc_id: Long, ts: Timestamp)
  case class BucketState(firstDoc: Long)
  case class NearDup(doc_id: Long, first_doc: Long, bkey: String)

  /** Streaming NEAR-dup candidate detection — the streaming analog of
    * q_dedup_minhash_lsh for continuous ingest: each arriving document
    * computes its banded minhash signature ROW-LOCALLY (no per-batch
    * shuffle beyond the band-bucket grouping), and a per-bucket state
    * entry remembers the first document seen in that bucket. Every
    * later arrival in the same bucket emits a (doc, first_doc)
    * candidate pair — exactly the "star" subset of the batch pair
    * graph, which is what an online keep/drop decision needs (drop
    * anything that collides with an already-admitted doc). Bucket
    * state is evicted by event-time timeout once the watermark passes,
    * so state is bounded by the watermark horizon — at 1000 executors
    * the buckets shard across the cluster's state stores by bkey.
    *
    * Input must carry (doc_id BIGINT, text STRING, ts TIMESTAMP).
    * The signature arithmetic is bit-identical to
    * DedupQueries.minhashPairs (same md5-derived 32-bit values, same
    * Carter-Wegman (a·v+b) mod p family, 4 bands of 2). */
  def nearDupCandidates(docs: DataFrame, watermark: String = "2 hours"): Dataset[NearDup] = {
    import docs.sparkSession.implicits._
    val words = split(col("text"), " ")
    val vs = transform(
      sequence(lit(1), size(col("words")) - 2),
      i => conv(substring(md5(concat_ws(" ",
        element_at(col("words"), i),
        element_at(col("words"), i + 1),
        element_at(col("words"), i + 2))), 1, 8), 16, 10).cast("long"))
    val mins = (0 to 7).map { seed =>
      array_min(transform(col("vs"), v =>
        (v * lit(1000003L + 999983L * seed) + lit(seed.toLong))
          % lit(4294967291L))).as(s"m$seed")
    }
    val bandArr = array((0 to 3).map(b =>
      concat(lit(s"$b:"), col(s"m${2 * b}").cast("string"), lit(","),
        col(s"m${2 * b + 1}").cast("string"))): _*)
    val bands = docs
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"), words.as("words"))
      .select(col("doc_id"), col("ts"), vs.as("vs"))
      .select(col("doc_id") +: col("ts") +: mins: _*)
      .select(col("doc_id"), col("ts"), explode(bandArr).as("bkey"))
      .as[BandRow]
    bands
      .groupByKey(_.bkey)
      .flatMapGroupsWithState[BucketState, NearDup](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bkey: String, batch: Iterator[BandRow], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // within a micro-batch, arrival order is not defined —
            // doc_id order (ingest order) makes the decision
            // deterministic and matches the batch min-star convention
            val rows = batch.toSeq.sortBy(_.doc_id)
            var first = state.getOption.map(_.firstDoc)
            val out = rows.flatMap { r =>
              first match {
                case None => first = Some(r.doc_id); Nil
                case Some(f) if r.doc_id != f =>
                  Some(NearDup(r.doc_id, f, bkey))
                case _ => Nil
              }
            }
            first.foreach { f =>
              state.update(BucketState(f))
              // evict the bucket once the watermark passes its last
              // arrival + horizon — bounded state
              rows.lastOption.foreach(r =>
                state.setTimeoutTimestamp(r.ts.getTime, watermark))
            }
            out.iterator
          }
      }
  }

  /** Streaming quality gate + ingest metering: each arriving document
    * is scored by the SAME fixed-weight logistic classifier as the
    * batch operator (graft.queries.PipelineQueries.qualityScore — one
    * definition, no drift), gated at 0.5, and per-(hour, source)
    * counters meter total/admitted docs and admitted tokens — the live
    * dashboard of a continuous training-data ingest. A stateless
    * row-local filter followed by a watermarked windowed aggregation:
    * window state is evicted as the watermark passes, so state is
    * bounded at any ingest rate.
    *
    * Input must carry (doc_id BIGINT, text STRING, source STRING,
    * ts TIMESTAMP). */
  def qualityGate(docs: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val score = graft.queries.PipelineQueries.qualityScore
    val toks = size(split(col("text"), " ")).cast("long")
    docs
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .withColumn("keep", score >= 0.5)
      .withColumn("toks", toks)
      .groupBy(window(col("ts"), "1 hour"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_admitted"),
        sum(when(col("keep"), col("toks")).otherwise(0L)).as("admitted_toks"))
      .select(col("window.start").as("hr"), col("source"),
        col("n_docs"), col("n_admitted"), col("admitted_toks"))
  }
}
