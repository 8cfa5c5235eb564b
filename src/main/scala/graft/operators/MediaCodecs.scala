package graft.operators

/** REAL pure-JVM media codecs for the multimodal pipeline — no native
  * libraries required, so the decode step stops being a stub for the
  * formats a JVM can honestly parse:
  *
  *  - [[WavCodec]]: RIFF/WAVE PCM — full chunk walk (fmt /data with
  *    arbitrary extra chunks, word-aligned chunk sizes, little-endian
  *    fields), 16-bit mono/stereo decode to samples.
  *  - [[PpmCodec]]: binary PPM (P6) — header tokenizer with comment
  *    and whitespace handling, raw RGB planes.
  *
  *  - [[AviCodec]]: uncompressed RIFF/AVI (BI_RGB 24bpp DIB frames) —
  *    hdrl/strl/strf geometry parse, movi chunk walk, bottom-up padded
  *    BGR rows ↔ top-down RGB planes. H.264-class codecs stay out of
  *    honest reach without native libraries; uncompressed AVI is the
  *    real container format a JVM can parse end to end.
  *
  * Encode exists so the fixture generator can synthesize REAL files
  * distributed-side; decode is the production path. Round-trip and
  * malformed-input behavior are pinned in MultimodalSpec, and the
  * decode arithmetic is oracle-checked end-to-end (q_mm_wav_stats /
  * q_mm_ppm_stats recompute the expected features in closed form in
  * DuckDB SQL — a header-parse or endianness bug fails the hash gate).
  */
object MediaCodecs {

  // ---------------------------------------------------------------- WAV

  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  object WavCodec {

    /** Minimal canonical RIFF/WAVE writer: PCM, 16-bit. */
    def encode(samples: Array[Short], sampleRate: Int, channels: Int = 1): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII"))
      buf.putInt(36 + dataLen)
      buf.put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII"))
      buf.putInt(16) // PCM fmt chunk size
      buf.putShort(1) // audioFormat = PCM
      buf.putShort(channels.toShort)
      buf.putInt(sampleRate)
      buf.putInt(sampleRate * channels * 2) // byte rate
      buf.putShort((channels * 2).toShort) // block align
      buf.putShort(16) // bits per sample
      buf.put("data".getBytes("US-ASCII"))
      buf.putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }

    /** Full RIFF chunk walk: tolerates extra chunks (LIST, fact, …)
      * before/after fmt/data and word-aligned (padded) chunk sizes.
      * Throws IllegalArgumentException on non-WAV or non-16-bit-PCM
      * payloads — a decode error, not silent garbage. */
    def decode(bytes: Array[Byte]): WavAudio = {
      def fail(msg: String) = throw new IllegalArgumentException(s"WAV decode: $msg")
      if (bytes.length < 12) fail("truncated header")
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      if (fourcc() != "RIFF") fail("missing RIFF magic")
      buf.getInt // riff size (unreliable in the wild; chunk walk below is authoritative)
      if (fourcc() != "WAVE") fail("not a WAVE form")
      var sampleRate = -1
      var channels = -1
      var bits = -1
      var fmtCode = -1
      var data: Array[Byte] = null
      while (buf.remaining() >= 8) {
        val id = fourcc()
        val size = buf.getInt
        if (size < 0 || size > buf.remaining()) fail(s"chunk '$id' overruns payload")
        val body = new Array[Byte](size)
        buf.get(body)
        if (size % 2 == 1 && buf.remaining() > 0) buf.get() // RIFF word alignment pad
        id match {
          case "fmt " =>
            if (size < 16) fail("fmt chunk too small")
            val f = java.nio.ByteBuffer.wrap(body).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            fmtCode = f.getShort & 0xffff
            channels = f.getShort & 0xffff
            sampleRate = f.getInt
            f.getInt // byte rate
            f.getShort // block align
            bits = f.getShort & 0xffff
          case "data" => data = body
          case _ => // LIST/fact/cue/… — skipped, as a real reader does
        }
      }
      if (fmtCode == -1 || data == null) fail("missing fmt or data chunk")
      if (fmtCode != 1) fail(s"unsupported audio format $fmtCode (PCM only)")
      if (bits != 16) fail(s"unsupported bit depth $bits (16-bit only)")
      if (channels < 1) fail("zero channels")
      val n = data.length / 2
      val samples = new Array[Short](n)
      val d = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < n) { samples(i) = d.getShort; i += 1 }
      WavAudio(sampleRate, channels, samples)
    }
  }

  // ---------------------------------------------------------------- PPM

  final case class PpmImage(width: Int, height: Int, rgb: Array[Byte])

  object PpmCodec {

    def encode(img: PpmImage): Array[Byte] = {
      require(img.rgb.length == img.width * img.height * 3, "rgb plane size mismatch")
      val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + img.rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
      out
    }

    /** Real P6 header tokenizer: arbitrary whitespace between tokens,
      * `#` comments to end-of-line, exactly one whitespace byte after
      * maxval before the raster (the spec's rule). */
    def decode(bytes: Array[Byte]): PpmImage = {
      def fail(msg: String) = throw new IllegalArgumentException(s"PPM decode: $msg")
      var i = 0
      def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
      def skipWsAndComments(): Unit = {
        var moved = true
        while (moved) {
          moved = false
          while (i < bytes.length && isWs(bytes(i))) { i += 1; moved = true }
          if (i < bytes.length && bytes(i) == '#') {
            while (i < bytes.length && bytes(i) != '\n') i += 1
            moved = true
          }
        }
      }
      def token(): String = {
        skipWsAndComments()
        val start = i
        while (i < bytes.length && !isWs(bytes(i)) && bytes(i) != '#') i += 1
        if (i == start) fail("truncated header")
        new String(bytes, start, i - start, "US-ASCII")
      }
      if (token() != "P6") fail("not a P6 ppm")
      val w = token().toInt
      val h = token().toInt
      val maxval = token().toInt
      if (maxval != 255) fail(s"unsupported maxval $maxval (8-bit only)")
      if (i >= bytes.length || !isWs(bytes(i))) fail("missing raster separator")
      i += 1 // exactly ONE whitespace byte, then raster
      val need = w * h * 3
      if (bytes.length - i < need) fail(s"raster truncated (${bytes.length - i} < $need)")
      PpmImage(w, h, java.util.Arrays.copyOfRange(bytes, i, i + need))
    }
  }

  // ---------------------------------------------------------------- AVI

  /** Uncompressed 24-bit video: `frames` are TOP-DOWN RGB planes of
    * `width*height*3` bytes each (the natural raster order the rest of
    * the pipeline consumes). On disk, AVI DIB frames are BOTTOM-UP
    * BGR with rows padded to 4-byte boundaries — the codec owns both
    * conversions, and the oracle's position-weighted checksum
    * (q_mm_avi_stats) fails if either the row flip or the padding walk
    * is wrong, not just the byte sum. */
  final case class AviVideo(width: Int, height: Int, fps: Int,
      frames: Array[Array[Byte]])

  object AviCodec {

    private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    /** RIFF/AVI writer: hdrl (avih + strl(strh 'vids'/'DIB ' + strf
      * BITMAPINFOHEADER BI_RGB 24bpp)) + movi ('00db' DIB frames) +
      * idx1 — the standard uncompressed-AVI layout. */
    def encode(v: AviVideo): Array[Byte] = {
      require(v.frames.forall(_.length == v.width * v.height * 3),
        "frame plane size mismatch")
      val stride = (v.width * 3 + 3) & ~3
      val frameBytes = stride * v.height
      val nf = v.frames.length
      val moviBody = 4 + nf * (8 + frameBytes)
      val idx1Body = nf * 16
      val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
      val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody) + (8 + idx1Body)
      val buf = java.nio.ByteBuffer.allocate(8 + riffBody)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(fourcc("RIFF")); buf.putInt(riffBody); buf.put(fourcc("AVI "))
      // LIST hdrl
      buf.put(fourcc("LIST")); buf.putInt(hdrlBody); buf.put(fourcc("hdrl"))
      buf.put(fourcc("avih")); buf.putInt(56)
      buf.putInt(1000000 / math.max(v.fps, 1)) // dwMicroSecPerFrame
      buf.putInt(frameBytes * v.fps)           // dwMaxBytesPerSec
      buf.putInt(0)                            // dwPaddingGranularity
      buf.putInt(0x10)                         // dwFlags = AVIF_HASINDEX
      buf.putInt(nf)                           // dwTotalFrames
      buf.putInt(0)                            // dwInitialFrames
      buf.putInt(1)                            // dwStreams
      buf.putInt(frameBytes)                   // dwSuggestedBufferSize
      buf.putInt(v.width); buf.putInt(v.height)
      (0 until 4).foreach(_ => buf.putInt(0))  // dwReserved
      // LIST strl
      buf.put(fourcc("LIST")); buf.putInt(4 + (8 + 56) + (8 + 40)); buf.put(fourcc("strl"))
      buf.put(fourcc("strh")); buf.putInt(56)
      buf.put(fourcc("vids")); buf.put(fourcc("DIB "))
      buf.putInt(0); buf.putShort(0); buf.putShort(0) // flags, priority, language
      buf.putInt(0)          // dwInitialFrames
      buf.putInt(1)          // dwScale
      buf.putInt(v.fps)      // dwRate
      buf.putInt(0)          // dwStart
      buf.putInt(nf)         // dwLength
      buf.putInt(frameBytes) // dwSuggestedBufferSize
      buf.putInt(-1)         // dwQuality
      buf.putInt(0)          // dwSampleSize
      buf.putShort(0); buf.putShort(0)
      buf.putShort(v.width.toShort); buf.putShort(v.height.toShort) // rcFrame
      buf.put(fourcc("strf")); buf.putInt(40)
      buf.putInt(40)                 // biSize
      buf.putInt(v.width); buf.putInt(v.height)
      buf.putShort(1); buf.putShort(24) // biPlanes, biBitCount
      buf.putInt(0)                  // biCompression = BI_RGB
      buf.putInt(frameBytes)         // biSizeImage
      buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
      // LIST movi
      val moviStart = buf.position()
      buf.put(fourcc("LIST")); buf.putInt(moviBody); buf.put(fourcc("movi"))
      val offsets = new Array[Int](nf)
      var f = 0
      while (f < nf) {
        offsets(f) = buf.position() - moviStart - 8 // relative to 'movi' fourcc
        buf.put(fourcc("00db")); buf.putInt(frameBytes)
        val rgb = v.frames(f)
        var y = v.height - 1 // DIB rows are bottom-up
        while (y >= 0) {
          var x = 0
          while (x < v.width) {
            val src = (y * v.width + x) * 3
            buf.put(rgb(src + 2)); buf.put(rgb(src + 1)); buf.put(rgb(src)) // BGR
            x += 1
          }
          var pad = stride - v.width * 3
          while (pad > 0) { buf.put(0.toByte); pad -= 1 }
          y -= 1
        }
        f += 1
      }
      // idx1
      buf.put(fourcc("idx1")); buf.putInt(idx1Body)
      f = 0
      while (f < nf) {
        buf.put(fourcc("00db")); buf.putInt(0x10) // AVIIF_KEYFRAME
        buf.putInt(offsets(f)); buf.putInt(frameBytes)
        f += 1
      }
      buf.array()
    }

    /** Full RIFF walk: finds hdrl's avih/strf for the geometry
      * (requires BI_RGB 24bpp), then decodes every '00db'/'00dc' movi
      * chunk from bottom-up padded BGR to top-down RGB. Tolerates
      * extra chunks (JUNK, LIST odml, ...) and word-aligned sizes;
      * throws IllegalArgumentException on anything that is not an
      * uncompressed 24-bit AVI — a decode error, not silent garbage. */
    def decode(bytes: Array[Byte]): AviVideo = {
      def fail(msg: String) = throw new IllegalArgumentException(s"AVI decode: $msg")
      if (bytes.length < 12) fail("truncated header")
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def cc(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      if (cc() != "RIFF") fail("not a RIFF container")
      val riffLen = buf.getInt
      if (riffLen < 4 || riffLen > bytes.length - 8) fail("bad RIFF size")
      if (cc() != "AVI ") fail("not an AVI")
      var width = -1
      var height = -1
      var bitCount = -1
      var compression = -1
      var fps = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

      def walkList(end: Int, kind: String): Unit = {
        while (buf.position() + 8 <= end) {
          val id = cc()
          val len = buf.getInt
          val next = buf.position() + len + (len & 1) // word-aligned
          if (len < 0 || buf.position() + len > end) fail(s"chunk $id overruns its parent")
          id match {
            case "LIST" =>
              val listKind = cc()
              walkList(next, listKind)
            case "avih" =>
              if (len < 40) fail("avih too short")
              val usec = buf.getInt
              if (usec > 0) fps = math.round(1000000.0 / usec).toInt
            case "strf" if kind == "strl" =>
              if (len < 40) fail("strf too short")
              buf.getInt // biSize
              width = buf.getInt
              height = buf.getInt
              buf.getShort // planes
              bitCount = buf.getShort
              compression = buf.getInt
            case fid if kind == "movi" && (fid.endsWith("db") || fid.endsWith("dc")) =>
              if (width <= 0 || height <= 0) fail("frame chunk before stream format")
              if (bitCount != 24) fail(s"unsupported bit depth $bitCount (24bpp only)")
              if (compression != 0) fail(s"compressed AVI not supported (biCompression=$compression)")
              val stride = (width * 3 + 3) & ~3
              if (len != stride * height) fail(s"frame size $len != expected ${stride * height}")
              val rgb = new Array[Byte](width * height * 3)
              val base = buf.position()
              var y = 0
              while (y < height) {
                val srcRow = base + (height - 1 - y) * stride // bottom-up
                var x = 0
                while (x < width) {
                  val src = srcRow + x * 3
                  val dst = (y * width + x) * 3
                  rgb(dst) = bytes(src + 2)     // R from BGR
                  rgb(dst + 1) = bytes(src + 1)
                  rgb(dst + 2) = bytes(src)
                  x += 1
                }
                y += 1
              }
              frames += rgb
            case _ => // JUNK, idx1, strh, odml, ... skipped
          }
          buf.position(math.min(next, end))
        }
      }
      walkList(8 + riffLen, "AVI ")
      if (width <= 0 || height <= 0) fail("no video stream format found")
      AviVideo(width, height, fps, frames.toArray)
    }
  }
}
