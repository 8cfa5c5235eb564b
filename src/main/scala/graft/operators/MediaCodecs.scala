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
  * H.264-class video stays out of honest reach in this container and
  * keeps the documented deterministic stand-in (Multimodal.FakeDecoder).
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
}
