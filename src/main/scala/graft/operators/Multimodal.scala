package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder-prompt extension surface):
  * image/audio/video as opaque `binary` payloads + typed metadata, with
  * decode / feature-extraction / resize / frame-sample stages.
  *
  * r8: audio and image decode are REAL — [[MediaCodecs.WavCodec]]
  * parses actual RIFF/WAVE PCM and [[MediaCodecs.PpmCodec]] actual P6
  * ppm (see mediaAssets/wavStats/ppmStats below, oracle-checked).
  * Only VIDEO decode remains a stub — an H.264 parser is not honestly
  * reachable without native codecs, so `FakeDecoder` derives
  * deterministic "pixels" from the payload bytes for that kind.
  * Everything around it is the real production shape:
  *  - payloads live in a `BinaryType` column (columnar parquet pages,
  *    never materialized on the driver);
  *  - per-row metadata is a typed struct column, so filters on
  *    width/duration prune without touching payload bytes (parquet
  *    column projection);
  *  - heavy per-item work runs in `mapPartitions` over a typed
  *    Dataset — one JVM-side batch loop per partition, the Scala
  *    analog of a mapInPandas batch UDF: amortized setup (the decoder
  *    is constructed once per partition, not per row), streaming
  *    iterator in/out, no driver collect;
  *  - output schemas are fixed case classes, so downstream stages are
  *    ordinary relational ops again.
  */
object Multimodal {

  case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRate: Int, nFrames: Int)
  case class MediaRow(mediaId: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(mediaId: Long, kind: String, nBytes: Int,
      byteMean: Double, histogram: Array[Long])
  case class Frame(mediaId: Long, frameNo: Int, frameBytes: Array[Byte])

  /** Deterministic stand-in for an image/audio/video decoder. A real
    * deployment swaps `decode` for the codec call; the partition/batch
    * shape around it is unchanged. */
  object FakeDecoder {
    /** "Decode" = identity over payload bytes (a real decoder would
      * produce pixel/sample buffers here). */
    def decode(payload: Array[Byte]): Array[Byte] = payload

    def features(r: MediaRow): MediaFeatures = {
      val px = decode(r.payload)
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < px.length) {
        val b = px(i) & 0xff
        hist(b >> 4) += 1
        sum += b
        i += 1
      }
      MediaFeatures(r.mediaId, r.meta.kind, px.length,
        if (px.length == 0) 0.0 else sum.toDouble / px.length, hist)
    }

    /** "Resize": crop/pad the decoded buffer to w*h bytes — stands in
      * for a real scaler; keeps output size metadata-driven. */
    def resize(px: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(px, w * h)

    /** Frame sampling for "video": every strideth 64-byte window. */
    def sampleFrames(r: MediaRow, stride: Int): Iterator[Frame] = {
      val px = decode(r.payload)
      Iterator.range(0, r.meta.nFrames, stride).map { f =>
        val off = math.min(f * 64, math.max(px.length - 64, 0))
        Frame(r.mediaId, f, java.util.Arrays.copyOfRange(px, off, math.min(off + 64, px.length)))
      }
    }
  }

  /** Synthesize a media table from the documents fixture: payload bytes
    * from md5 (deterministic), kind/meta from doc_id. Stands in for
    * `spark.read.format("binaryFile")` or a parquet lake of blobs. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    val docs = graft.engine.Tables(spark, sfDir).documents
    docs.select(
        col("doc_id").as("mediaId"),
        struct(
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("kind"),
          (col("doc_id") % 64 + 16).cast("int").as("width"),
          (col("doc_id") % 48 + 16).cast("int").as("height"),
          lit(16000).cast("int").as("sampleRate"),
          (col("doc_id") % 30 + 1).cast("int").as("nFrames")).as("meta"),
        unhex(concat(md5(col("text")), md5(concat(col("text"), lit("x"))),
          md5(concat(col("text"), lit("y"))), md5(concat(col("text"), lit("z")))))
          .as("payload"))
      .as[MediaRow]
  }

  // ------------------------------------------------------- real codecs

  /** A media row whose payload is a REAL encoded file (RIFF/WAVE PCM
    * for audio, binary PPM for images) — the decode stage below parses
    * actual headers and sample/pixel planes via [[MediaCodecs]], no
    * stub. Video keeps the documented deterministic stand-in (H.264 is
    * not honestly parseable without native codecs). */
  case class MediaAsset(mediaId: Long, kind: String, payload: Array[Byte])
  case class WavStats(mediaId: Long, sampleRate: Int, channels: Int,
      nSamples: Int, sumAmp: Long, sumSq: Long)
  case class PpmStats(mediaId: Long, width: Int, height: Int,
      nBytes: Int, sumPx: Long)

  /** Synthesize REAL media files distributed-side, one per document:
    * deterministic sample/pixel sequences with a closed form, so the
    * DuckDB oracle can recompute the decoded features arithmetically —
    * an endianness or header-walk bug in the decoder fails the hash
    * gate, not just a unit test. */
  def mediaAssets(spark: SparkSession, sfDir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    import graft.operators.MediaCodecs._
    val ids = graft.engine.Tables(spark, sfDir).documents
      .select(col("doc_id")).as[Long]
    ids.map { id =>
      (id % 3) match {
        case 1 => // audio: 16-bit PCM, LCG-ish samples
          val n = (400 + id % 100).toInt
          val rate = (8000 + (id % 5) * 2000).toInt
          val samples = Array.tabulate(n)(i => (((id * 31 + i * 7) % 65536) - 32768).toShort)
          MediaAsset(id, "audio", WavCodec.encode(samples, rate))
        case 0 => // image: P6 ppm, gradient pixels
          val w = (id % 16 + 8).toInt
          val h = (id % 12 + 8).toInt
          val rgb = Array.tabulate(w * h * 3)(i => ((id + i) % 256).toByte)
          MediaAsset(id, "image", PpmCodec.encode(PpmImage(w, h, rgb)))
        case _ => // video: deterministic opaque payload (stub class)
          MediaAsset(id, "video", Array.tabulate(64)(i => ((id * 7 + i) % 256).toByte))
      }
    }
  }

  /** REAL WAV decode per partition: header chunk walk + 16-bit PCM
    * parse (MediaCodecs.WavCodec); features are exact integer sums so
    * the oracle compare is bit-exact. */
  def wavStats(assets: Dataset[MediaAsset]): Dataset[WavStats] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").mapPartitions(_.map { a =>
      val w = MediaCodecs.WavCodec.decode(a.payload)
      var s = 0L
      var q = 0L
      w.samples.foreach { v => s += v; q += v.toLong * v }
      WavStats(a.mediaId, w.sampleRate, w.channels, w.samples.length, s, q)
    })
  }

  /** REAL PPM decode per partition (MediaCodecs.PpmCodec). */
  def ppmStats(assets: Dataset[MediaAsset]): Dataset[PpmStats] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions(_.map { a =>
      val img = MediaCodecs.PpmCodec.decode(a.payload)
      var s = 0L
      img.rgb.foreach(b => s += (b & 0xff))
      PpmStats(a.mediaId, img.width, img.height, img.rgb.length, s)
    })
  }

  /** Batch feature extraction: decoder constructed once per partition;
    * rows stream through in one pass. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would open the real codec once here
      rows.map(FakeDecoder.features)
    }
  }

  /** Frame sampling: flatMap keeps the operation streaming — a media
    * item never has all frames resident unless consumed. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.kind == "video")
      .flatMap(FakeDecoder.sampleFrames(_, stride))
  }
}
