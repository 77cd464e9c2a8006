package graft.multimodal

/** Real pure-JVM media codecs behind the [[MediaDecoder]] seam: WAV/PCM
  * (RIFF little-endian chunk stream) and binary PPM/PGM (netpbm P6/P5).
  * Both formats are fixed-layout arithmetic — no native library — so the
  * decode path that production swaps in for JPEG/FLAC/MP4 can be exercised
  * END TO END here: real container bytes in, parsed headers and samples
  * out, with the q231 gate replaying every decoded number in DuckDB from
  * the synthesis closed form (a header misparse shifts every sum and fails
  * the hash).
  *
  * Layout references (public specs): RIFF/WAVE — `RIFF <u32 size> WAVE`
  * then `<fourcc><u32 size><payload>[pad]` chunks, `fmt ` carrying
  * (audioFormat=1 PCM, channels u16, sampleRate u32, byteRate u32,
  * blockAlign u16, bitsPerSample u16) and `data` carrying LE samples;
  * netpbm — ASCII header `P6 <w> <h> <maxval>` with `#` comments, one
  * whitespace byte, then row-major binary raster (RGB triplets for P6,
  * single gray bytes for P5).
  */
object Codecs {

  // ---------------------------------------------------------------- WAV

  /** Decoded PCM stats: everything a pipeline keys on before transcription
    * (layout fields) plus the two exact integer moments of the signal
    * (sum and sum of squares — RMS = sqrt(sumSq/n) derives from them
    * without a float fold over samples).
    */
  final case class WavInfo(
      channels: Int, sampleRateHz: Int, bitsPerSample: Int,
      nSamples: Long, sumAmp: Long, sumSq: Long) {
    def durationMs: Double = nSamples * 1000.0 / sampleRateHz
    def rms: Double = math.sqrt(sumSq.toDouble / nSamples)
  }

  /** Canonical 44-byte-header mono 16-bit PCM WAV. */
  def wavBytes(sampleRateHz: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRateHz)
      .putInt(sampleRateHz * 2) // byte rate = rate * channels * bits/8
      .putShort(2) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  private final case class WavLayout(channels: Int, rate: Int, bits: Int,
      dataOff: Int, dataLen: Int, bb: java.nio.ByteBuffer)

  /** The shared RIFF/WAVE chunk walk: tolerates extra chunks like
    * LIST/INFO between fmt and data and the RIFF pad byte after
    * odd-sized chunks, requires PCM format 1 at 16 bits.
    */
  private def walkWav(bytes: Array[Byte]): WavLayout = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12, s"not a RIFF file: ${bytes.length} bytes")
    val riff = new Array[Byte](4); bb.get(riff)
    require(new String(riff, "US-ASCII") == "RIFF", "missing RIFF magic")
    bb.getInt // declared riff size — trust the actual buffer instead
    val wave = new Array[Byte](4); bb.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE", "not a WAVE form")
    var channels = -1; var rate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (bb.remaining() >= 8 && (rate < 0 || dataOff < 0)) {
      val id = new Array[Byte](4); bb.get(id)
      val size = bb.getInt
      val fourcc = new String(id, "US-ASCII")
      require(size >= 0 && size <= bb.remaining(),
        s"chunk $fourcc overruns buffer: $size > ${bb.remaining()}")
      fourcc match {
        case "fmt " =>
          val p = bb.position()
          val fmt = bb.getShort(p) & 0xFFFF
          require(fmt == 1, s"only PCM (format 1) supported, got $fmt")
          channels = bb.getShort(p + 2) & 0xFFFF
          // the decode paths treat the data chunk as one channel of
          // samples: a stereo file would report doubled counts and
          // fingerprint across interleaved channels — refuse it here
          // (the production decoder behind the seam de-interleaves)
          require(channels == 1,
            s"only mono PCM supported, got $channels channels")
          rate = bb.getInt(p + 4)
          bits = bb.getShort(p + 14) & 0xFFFF
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
        case "data" =>
          dataOff = bb.position(); dataLen = size
        case _ => // skip foreign chunk (LIST, fact, ...)
      }
      bb.position(bb.position() + size + (size & 1)) // odd chunks pad 1
    }
    require(rate > 0, "no fmt chunk")
    require(dataOff >= 0, "no data chunk")
    WavLayout(channels, rate, bits, dataOff, dataLen, bb)
  }

  /** Parse a RIFF/WAVE byte stream and fold the samples into exact
    * integer moments (no sample array materialized — the stats path).
    */
  def decodeWav(bytes: Array[Byte]): WavInfo = {
    val l = walkWav(bytes)
    val n = l.dataLen / 2
    var sum = 0L; var sumSq = 0L
    var i = 0
    while (i < n) {
      val s = l.bb.getShort(l.dataOff + 2 * i).toLong
      sum += s; sumSq += s * s
      i += 1
    }
    WavInfo(l.channels, l.rate, l.bits, n, sum, sumSq)
  }

  /** Parse a RIFF/WAVE byte stream and materialize the 16-bit PCM
    * samples — the fingerprinting path ([[AudioFingerprint]] needs the
    * signal itself where [[decodeWav]] needs only its moments). Returns
    * (sampleRateHz, samples).
    */
  def decodeWavSamples(bytes: Array[Byte]): (Int, Array[Short]) = {
    val l = walkWav(bytes)
    val n = l.dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = l.bb.getShort(l.dataOff + 2 * i); i += 1 }
    (l.rate, out)
  }

  // --------------------------------------------------------- PPM / PGM

  /** Decoded image stats: dimensions plus exact per-channel integer sums
    * (mean channel value = sum / (w*h) derives without a float fold).
    */
  final case class PpmInfo(
      width: Int, height: Int, sumR: Long, sumG: Long, sumB: Long)

  /** Binary PPM (P6), maxval 255, `rgb` row-major RGB triplets. */
  def ppmBytes(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"raster ${rgb.length} != ${w}x${h}x3")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ rgb
  }

  /** Binary PGM (P5), maxval 255, `gray` row-major bytes. */
  def pgmBytes(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h, s"raster ${gray.length} != ${w}x$h")
    s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++ gray
  }

  /** Netpbm header scan: after the magic, three ASCII integers (w, h,
    * maxval) separated by whitespace, `#` comments running to end of
    * line, then EXACTLY ONE whitespace byte before the raster. Returns
    * (w, h, rasterOffset).
    */
  private def pnmHeader(bytes: Array[Byte], magic: String): (Int, Int, Int) = {
    require(bytes.length >= 2 &&
      bytes(0) == 'P'.toByte && bytes(1) == magic(1).toByte,
      s"missing $magic magic")
    var pos = 2
    def skipSeparators(): Unit = {
      var more = true
      while (more && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#'.toByte) { // comment to end of line
          while (pos < bytes.length && bytes(pos) != '\n'.toByte) pos += 1
        } else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else more = false
      }
    }
    def int(): Int = {
      skipSeparators()
      val start = pos
      while (pos < bytes.length && bytes(pos) >= '0'.toByte && bytes(pos) <= '9'.toByte)
        pos += 1
      require(pos > start, s"expected integer at byte $start")
      new String(bytes, start, pos - start, "US-ASCII").toInt
    }
    val w = int(); val h = int(); val maxval = int()
    require(maxval == 255, s"only maxval 255 supported, got $maxval")
    pos += 1 // the single whitespace byte that terminates the header
    (w, h, pos)
  }

  /** Parse a binary PPM (P6): header scan + exact channel sums. */
  def decodePpm(bytes: Array[Byte]): PpmInfo = {
    val (w, h, off) = pnmHeader(bytes, "P6")
    require(bytes.length - off >= w * h * 3,
      s"raster truncated: ${bytes.length - off} < ${w * h * 3}")
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < w * h) {
      r += bytes(off + 3 * i) & 0xFF
      g += bytes(off + 3 * i + 1) & 0xFF
      b += bytes(off + 3 * i + 2) & 0xFF
      i += 1
    }
    PpmInfo(w, h, r, g, b)
  }

  /** Parse a binary PGM (P5): header scan + row-major pixel array. */
  def decodePgm(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val (w, h, off) = pnmHeader(bytes, "P5")
    require(bytes.length - off >= w * h,
      s"raster truncated: ${bytes.length - off} < ${w * h}")
    (w, h, Array.tabulate(w * h)(i => bytes(off + i) & 0xFF))
  }
}

/** One decoded-media stats row (q231): scalar columns only (the driver
  * compare sorts cells), modality-inapplicable fields None. Every value
  * comes from PARSED container bytes, never from the synthesis params.
  */
final case class MediaStats(
    media_id: Long, fmt: String,
    width: Option[Int], height: Option[Int],
    channels: Option[Int], sample_rate: Option[Int], bits: Option[Int],
    n_samples: Option[Long], duration_ms: Option[Double],
    sum_amp: Option[Long], sum_sq: Option[Long],
    sum_r: Option[Long], sum_g: Option[Long], sum_b: Option[Long])

/** [[MediaDecoder]] carrying the real codecs: sniffs the container magic
  * (RIFF → WAV, P6 → PPM) and fills [[DecodedMedia]] from PARSED bytes —
  * the drop-in proof that the decode seam's shape survives a production
  * decoder. Features: audio → [rms/32768, mean/32768]; image →
  * [meanR, meanG, meanB]/255. Unknown containers fall back to
  * [[StubDecoder]] so mixed corpora keep flowing.
  */
object RealBinaryDecoder extends MediaDecoder {
  override def decode(r: MediaRecord): DecodedMedia = {
    val b = r.content
    if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
      val w = Codecs.decodeWav(b)
      DecodedMedia(r.media_id, "audio", b.length, width = 0, height = 0,
        n_frames = 1,
        features = Array(
          (w.rms / 32768.0).toFloat,
          (w.sumAmp.toDouble / w.nSamples / 32768.0).toFloat))
    } else if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
      val p = Codecs.decodePpm(b)
      val n = p.width.toLong * p.height * 255L
      DecodedMedia(r.media_id, "image", b.length, p.width, p.height,
        n_frames = 1,
        features = Array(
          (p.sumR.toDouble / n).toFloat,
          (p.sumG.toDouble / n).toFloat,
          (p.sumB.toDouble / n).toFloat))
    } else StubDecoder.decode(r)
  }
}
