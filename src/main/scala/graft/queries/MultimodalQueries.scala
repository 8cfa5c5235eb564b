package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import QueryDef.q

/** Multimodal pipeline queries: the Spark side synthesizes REAL media
  * files distributed-side (RIFF/WAVE PCM, binary P6 ppm, uncompressed
  * 24-bit RIFF/AVI) and DECODES them with graft.operators.MediaCodecs
  * — header chunk walks, little-endian PCM, PPM tokenizer, bottom-up
  * padded DIB rows. The oracle recomputes every decoded feature from
  * the generators' closed forms in DuckDB SQL, so an endianness,
  * header-parse, row-flip, or padding bug fails the hash gate, not
  * just a unit test. (r9: all three kinds are real — the r8 video
  * stand-in is gone.)
  */
object MultimodalQueries {

  // the generators' geometry, repeated in every oracle:
  //   image (doc_id%3=0): w=id%16+8, h=id%12+8, pixel i = (id+i)%256
  //   audio (doc_id%3=1): n=400+id%100, rate=8000+(id%5)*2000,
  //                       sample j = ((id*31+j*7)%65536)-32768
  //   video (doc_id%3=2): w=id%13+6, h=id%9+5, nf=id%4+2,
  //                       frame f pixel i = (id+f*17+i)%256

  val all: Seq[QueryDef] = Seq(

    // metadata pass: per-kind counts + REAL encoded file sizes — the
    // oracle recomputes the exact container layouts (44-byte canonical
    // WAV header, PPM header with variable-width ASCII dims, the full
    // RIFF/AVI chunk arithmetic incl. 4-byte row padding and idx1)
    q("q_mm_metadata",
      """SELECT kind, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes
        |FROM (
        |  SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 1 THEN 44 + 2 * (400 + doc_id % 100)
        |      WHEN 0 THEN 9 + length(CAST(doc_id % 16 + 8 AS VARCHAR))
        |                    + length(CAST(doc_id % 12 + 8 AS VARCHAR))
        |                    + (doc_id % 16 + 8) * (doc_id % 12 + 8) * 3
        |      ELSE 232 + (doc_id % 4 + 2)
        |                 * (24 + (((doc_id % 13 + 6) * 3 + 3) // 4) * 4 * (doc_id % 9 + 5))
        |    END AS n_bytes
        |  FROM documents
        |) GROUP BY kind ORDER BY kind""".stripMargin) { (s, dir) =>
      Multimodal.mediaAssets(s, dir).toDF()
        .select(col("kind"), length(col("payload")).cast("long").as("n_bytes"))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("total_bytes"))
        .orderBy(col("kind"))
    },

    // feature extraction over DECODED planes (image → RGB raster,
    // audio → LE 16-bit sample bytes, video → concatenated top-down
    // frame planes); histogram exploded to (bucket, cnt) rows for the
    // compare — the driver's row-sorting hash cannot order array cells.
    q("q_mm_features",
      """WITH m AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS k FROM documents),
        |img AS (SELECT doc_id, (doc_id % 16 + 8) * (doc_id % 12 + 8) * 3 AS n FROM m WHERE k = 0),
        |aud AS (SELECT doc_id, 400 + doc_id % 100 AS ns FROM m WHERE k = 1),
        |vid AS (SELECT doc_id, (doc_id % 13 + 6) * (doc_id % 9 + 5) * 3 AS fl, doc_id % 4 + 2 AS nf
        |        FROM m WHERE k = 2),
        |bytes AS (
        |  SELECT doc_id, (doc_id + i) % 256 AS bv
        |  FROM img, UNNEST(generate_series(0, n - 1)) AS t(i)
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN i % 2 = 0 THEN ((doc_id*31 + (i//2)*7) % 65536) % 256
        |                      ELSE (((doc_id*31 + (i//2)*7) % 65536 + 32768) % 65536) // 256 END
        |  FROM aud, UNNEST(generate_series(0, 2*ns - 1)) AS t(i)
        |  UNION ALL
        |  SELECT doc_id, (doc_id + (i // fl) * 17 + (i % fl)) % 256
        |  FROM vid, UNNEST(generate_series(0, nf*fl - 1)) AS t(i)
        |),
        |counts AS (SELECT doc_id, bv // 16 AS bucket, count(*) AS cnt FROM bytes GROUP BY 1, 2),
        |tot AS (SELECT doc_id, count(*) AS n_bytes, avg(bv) AS mean FROM bytes GROUP BY 1),
        |grid AS (SELECT doc_id, g.b FROM m, UNNEST(generate_series(0, 15)) AS g(b))
        |SELECT grid.doc_id AS media_id,
        |  CAST(tot.n_bytes AS BIGINT) AS n_bytes,
        |  round(tot.mean, 9) AS byte_mean,
        |  CAST(grid.b AS BIGINT) AS bucket,
        |  CAST(coalesce(counts.cnt, 0) AS BIGINT) AS cnt
        |FROM grid JOIN tot USING (doc_id)
        |LEFT JOIN counts ON counts.doc_id = grid.doc_id AND counts.bucket = grid.b
        |ORDER BY media_id, bucket LIMIT 4800""".stripMargin) { (s, dir) =>
      val feats = Multimodal.extractFeatures(Multimodal.mediaAssets(s, dir)).toDF()
      feats.select(
        col("mediaId").as("media_id"),
        col("nBytes").cast("long").as("n_bytes"),
        round(col("byteMean"), 9).as("byte_mean"),
        posexplode(col("histogram")).as(Seq("bucket", "cnt")))
        .select(col("media_id"), col("n_bytes"), col("byte_mean"),
          col("bucket").cast("long").as("bucket"), col("cnt").cast("long").as("cnt"))
        .orderBy(col("media_id"), col("bucket")).limit(4800)
    },

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

    // REAL AVI decode (r9): sum_px alone is invariant under a row flip
    // or a missed padding byte-run, so wsum_px weights every decoded
    // byte by its top-down in-frame position — the oracle only matches
    // if the DIB bottom-up unflip and the 4-byte row-stride walk are
    // both exactly right.
    q("q_mm_avi_stats",
      """WITH v AS (SELECT doc_id, doc_id % 13 + 6 AS w, doc_id % 9 + 5 AS h, doc_id % 4 + 2 AS nf
        |           FROM documents WHERE doc_id % 3 = 2),
        |px AS (SELECT doc_id, f, i, (doc_id + f*17 + i) % 256 AS bv
        |       FROM v, UNNEST(generate_series(0, nf - 1)) AS fr(f),
        |               UNNEST(generate_series(0, w*h*3 - 1)) AS t(i))
        |SELECT v.doc_id AS media_id,
        |  CAST(v.w AS BIGINT) AS width, CAST(v.h AS BIGINT) AS height,
        |  CAST(v.nf AS BIGINT) AS n_frames,
        |  CAST(sum(px.bv) AS BIGINT) AS sum_px,
        |  CAST(sum(px.bv * (px.i + 1)) AS BIGINT) AS wsum_px
        |FROM v JOIN px USING (doc_id)
        |GROUP BY 1, 2, 3, 4 ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.aviStats(Multimodal.mediaAssets(s, dir)).toDF()
        .select(col("mediaId").as("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("nFrames").cast("long").as("n_frames"),
          col("sumPx").as("sum_px"), col("wSumPx").as("wsum_px"))
        .orderBy(col("media_id"))
    },

    // frame sampling from the REAL container: every 2nd decoded frame's
    // top-down RGB plane, content-checked via the per-frame byte sum
    q("q_mm_frames",
      """WITH v AS (SELECT doc_id, doc_id % 13 + 6 AS w, doc_id % 9 + 5 AS h, doc_id % 4 + 2 AS nf
        |           FROM documents WHERE doc_id % 3 = 2),
        |fr AS (SELECT doc_id, w, h, f FROM v, UNNEST(generate_series(0, nf - 1, 2)) AS t(f)),
        |s AS (SELECT doc_id, f, sum((doc_id + f*17 + i) % 256) AS fsum
        |      FROM fr, UNNEST(generate_series(0, w*h*3 - 1)) AS t(i) GROUP BY 1, 2)
        |SELECT fr.doc_id AS media_id, CAST(fr.f AS BIGINT) AS frame_no,
        |  CAST(fr.w * fr.h * 3 AS BIGINT) AS frame_bytes_len,
        |  CAST(s.fsum AS BIGINT) AS frame_sum
        |FROM fr JOIN s ON s.doc_id = fr.doc_id AND s.f = fr.f
        |ORDER BY media_id, frame_no LIMIT 500""".stripMargin) { (s, dir) =>
      import s.implicits._
      val frames = Multimodal.sampleFrames(Multimodal.mediaAssets(s, dir), stride = 2)
      frames.map { fr =>
        var sum = 0L
        fr.frameBytes.foreach(b => sum += (b & 0xff))
        (fr.mediaId, fr.frameNo.toLong, fr.frameBytes.length.toLong, sum)
      }.toDF("media_id", "frame_no", "frame_bytes_len", "frame_sum")
        .orderBy(col("media_id"), col("frame_no")).limit(500)
    }
  )
}
