package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import QueryDef.q

/** Multimodal pipeline queries: the Spark side runs the REAL binary
  * pipeline (BinaryType payloads, typed metadata struct, mapPartitions
  * batch decode — graft.operators.Multimodal); the oracle recomputes
  * the same deterministic bytes arithmetically from the md5 hex, so
  * even the stubbed decode path is hash-checked end to end, not
  * rows-only.
  */
object MultimodalQueries {

  private val hexVal =
    "strpos('0123456789abcdef', substr(hx, POS, 1)) - 1"

  val all: Seq[QueryDef] = Seq(

    q("q_mm_metadata",
      """SELECT kind, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  min(width) AS min_w, max(height) AS max_h
        |FROM (
        |  SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |    octet_length(unhex(md5(text) || md5(text || 'x') || md5(text || 'y') || md5(text || 'z'))) AS n_bytes,
        |    CAST(doc_id % 64 + 16 AS INT) AS width,
        |    CAST(doc_id % 48 + 16 AS INT) AS height
        |  FROM documents
        |) GROUP BY kind ORDER BY kind""".stripMargin) { (s, dir) =>
      Multimodal.mediaTable(s, dir).toDF()
        .select(col("meta.kind").as("kind"), length(col("payload")).cast("long").as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("total_bytes"),
          min(col("width")).cast("long").as("min_w"), max(col("height")).cast("long").as("max_h"))
        .orderBy(col("kind"))
    },

    // histogram is exploded to (bucket, cnt) rows for the compare — the
    // driver's row-sorting hash cannot order array cells; the real
    // pipeline still computes the packed histogram array.
    q("q_mm_features", {
      val b = hexVal.replace("POS", "2*i - 1")
      val lo = hexVal.replace("POS", "2*i")
      s"""WITH h AS (
         |  SELECT doc_id,
         |    md5(text) || md5(text || 'x') || md5(text || 'y') || md5(text || 'z') AS hx
         |  FROM documents
         |), bytes AS (
         |  SELECT doc_id, ($b) * 16 + ($lo) AS bv
         |  FROM h, UNNEST(generate_series(1, 64)) AS t(i)
         |), counts AS (
         |  SELECT doc_id, bv // 16 AS bucket, count(*) AS cnt
         |  FROM bytes GROUP BY doc_id, bv // 16
         |), grid AS (
         |  SELECT DISTINCT doc_id, g.b FROM h, UNNEST(generate_series(0, 15)) AS g(b)
         |)
         |SELECT g.doc_id AS media_id,
         |  CAST(64 AS BIGINT) AS n_bytes,
         |  (SELECT round(avg(bv), 9) FROM bytes WHERE bytes.doc_id = g.doc_id) AS byte_mean,
         |  CAST(g.b AS BIGINT) AS bucket,
         |  CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
         |FROM grid g LEFT JOIN counts c ON c.doc_id = g.doc_id AND c.bucket = g.b
         |ORDER BY media_id, bucket LIMIT 4800""".stripMargin
    }) { (s, dir) =>
      val feats = Multimodal.extractFeatures(Multimodal.mediaTable(s, dir)).toDF()
      feats.select(
        col("mediaId").as("media_id"),
        col("nBytes").cast("long").as("n_bytes"),
        round(col("byteMean"), 9).as("byte_mean"),
        posexplode(col("histogram")).as(Seq("bucket", "cnt")))
        .select(col("media_id"), col("n_bytes"), col("byte_mean"),
          col("bucket").cast("long").as("bucket"), col("cnt").cast("long").as("cnt"))
        .orderBy(col("media_id"), col("bucket")).limit(4800)
    },

    // REAL codec paths (r8): the Spark side synthesizes actual
    // RIFF/WAVE and P6 files distributed-side and DECODES them with
    // MediaCodecs (header chunk walk, little-endian PCM, PPM header
    // tokenizer); the oracle recomputes the decoded features from the
    // generators' closed forms — a parse bug fails the hash gate.
    q("q_mm_wav_stats",
      """WITH a AS (SELECT doc_id, 400 + doc_id % 100 AS n
        |           FROM documents WHERE doc_id % 3 = 1),
        |s AS (SELECT doc_id, ((doc_id*31 + i*7) % 65536) - 32768 AS v
        |      FROM a, UNNEST(generate_series(0, n - 1)) AS t(i))
        |SELECT a.doc_id AS media_id,
        |  CAST(8000 + (a.doc_id % 5) * 2000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(a.n AS BIGINT) AS n_samples,
        |  CAST(sum(s.v) AS BIGINT) AS sum_amp,
        |  CAST(sum(s.v * s.v) AS BIGINT) AS sum_sq
        |FROM a JOIN s USING (doc_id)
        |GROUP BY 1, 2, 3, 4 ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.wavStats(Multimodal.mediaAssets(s, dir)).toDF()
        .select(col("mediaId").as("media_id"),
          col("sampleRate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("nSamples").cast("long").as("n_samples"),
          col("sumAmp").as("sum_amp"), col("sumSq").as("sum_sq"))
        .orderBy(col("media_id"))
    },

    q("q_mm_ppm_stats",
      """WITH p AS (SELECT doc_id, doc_id % 16 + 8 AS w, doc_id % 12 + 8 AS h
        |           FROM documents WHERE doc_id % 3 = 0),
        |px AS (SELECT doc_id, (doc_id + i) % 256 AS v
        |       FROM p, UNNEST(generate_series(0, w*h*3 - 1)) AS t(i))
        |SELECT p.doc_id AS media_id,
        |  CAST(p.w AS BIGINT) AS width, CAST(p.h AS BIGINT) AS height,
        |  CAST(p.w * p.h * 3 AS BIGINT) AS n_bytes,
        |  CAST(sum(px.v) AS BIGINT) AS sum_px
        |FROM p JOIN px USING (doc_id)
        |GROUP BY 1, 2, 3, 4 ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.ppmStats(Multimodal.mediaAssets(s, dir)).toDF()
        .select(col("mediaId").as("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("nBytes").cast("long").as("n_bytes"), col("sumPx").as("sum_px"))
        .orderBy(col("media_id"))
    },

    q("q_mm_frames",
      """SELECT media_id, frame_no, frame_bytes_len FROM (
        |  SELECT doc_id AS media_id, f.f AS frame_no, CAST(64 AS BIGINT) AS frame_bytes_len
        |  FROM documents,
        |    UNNEST(generate_series(0, CAST(doc_id % 30 AS BIGINT), 5)) AS f(f)
        |  WHERE doc_id % 3 = 2
        |) ORDER BY media_id, frame_no LIMIT 500""".stripMargin) { (s, dir) =>
      val frames = Multimodal.sampleFrames(Multimodal.mediaTable(s, dir), stride = 5).toDF()
      frames.select(
        col("mediaId").as("media_id"),
        col("frameNo").cast("long").as("frame_no"),
        length(col("frameBytes")).cast("long").as("frame_bytes_len"))
        .orderBy(col("media_id"), col("frame_no")).limit(500)
    }
  )
}
