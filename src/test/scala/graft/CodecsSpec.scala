package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Codecs, MediaRecord, RealBinaryDecoder}

/** Real-codec seam: WAV/PCM and netpbm bytes must decode to exactly the
  * values encoded, survive layout variations a real file exhibits (foreign
  * chunks, pad bytes, header comments), and reject truncated/foreign bytes
  * loudly instead of returning garbage.
  */
class CodecsSpec extends AnyFunSuite {

  private val samples = Array[Short](0, 1000, -1000, 32767, -32768, 17)

  test("WAV roundtrip: header fields and exact moments") {
    val w = Codecs.decodeWav(Codecs.wavBytes(8000, samples))
    assert(w.channels == 1 && w.sampleRateHz == 8000 && w.bitsPerSample == 16)
    assert(w.nSamples == samples.length)
    assert(w.sumAmp == samples.map(_.toLong).sum)
    assert(w.sumSq == samples.map(s => s.toLong * s).sum)
    assert(w.durationMs == samples.length * 1000.0 / 8000)
  }

  test("WAV chunk walk: foreign LIST chunk (odd size, padded) before data") {
    val base = Codecs.wavBytes(16000, samples)
    // splice an odd-sized LIST chunk (+1 pad byte) between fmt and data
    val bb = java.nio.ByteBuffer.allocate(base.length + 8 + 3 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(base, 0, 36) // RIFF..WAVE + fmt chunk
    bb.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3)).put(0.toByte) // odd size → 1 pad byte
    bb.put(base, 36, base.length - 36) // data chunk
    val w = Codecs.decodeWav(bb.array())
    assert(w.sampleRateHz == 16000 && w.nSamples == samples.length)
    assert(w.sumSq == samples.map(s => s.toLong * s).sum)
  }

  test("WAV rejects non-PCM and truncated containers") {
    val bad = Codecs.wavBytes(8000, samples)
    bad(20) = 3 // audioFormat = 3 (IEEE float)
    intercept[IllegalArgumentException](Codecs.decodeWav(bad))
    intercept[IllegalArgumentException](
      Codecs.decodeWav("RIFFxxxx".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      Codecs.decodeWav(Array[Byte](1, 2, 3)))
  }

  test("PPM roundtrip: dimensions and exact channel sums") {
    val w = 5; val h = 3
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37) % 256).toByte)
    val p = Codecs.decodePpm(Codecs.ppmBytes(w, h, rgb))
    assert(p.width == w && p.height == h)
    def chan(c: Int) = rgb.indices.collect {
      case i if i % 3 == c => (rgb(i) & 0xFF).toLong
    }.sum
    assert(p.sumR == chan(0) && p.sumG == chan(1) && p.sumB == chan(2))
  }

  test("PNM header: comments and arbitrary whitespace parse") {
    val gray = Array.tabulate(6)(i => (40 * i).toByte)
    val withComments =
      "P5 # raw pgm\n# a comment line\n 3 # width\n\t2\n255\n".getBytes("US-ASCII") ++ gray
    val (w, h, px) = Codecs.decodePgm(withComments)
    assert(w == 3 && h == 2)
    assert(px.toSeq == gray.map(_ & 0xFF).toSeq)
  }

  test("PGM/PPM reject truncated rasters and wrong magic") {
    intercept[IllegalArgumentException](
      Codecs.decodePpm("P6\n4 4\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2)))
    intercept[IllegalArgumentException](
      Codecs.decodePgm("P6\n2 2\n255\n".getBytes("US-ASCII") ++ new Array[Byte](12)))
  }

  test("RealBinaryDecoder sniffs containers and fills DecodedMedia from parsed bytes") {
    val wav = RealBinaryDecoder.decode(
      MediaRecord(1L, "audio", Codecs.wavBytes(8000, samples)))
    assert(wav.kind == "audio" && wav.width == 0)
    val expectedRms =
      math.sqrt(samples.map(s => s.toLong * s).sum.toDouble / samples.length)
    assert(math.abs(wav.features(0) - expectedRms / 32768.0) < 1e-6)

    val rgb = Array.fill(2 * 2 * 3)(255.toByte)
    val img = RealBinaryDecoder.decode(
      MediaRecord(2L, "image", Codecs.ppmBytes(2, 2, rgb)))
    assert(img.kind == "image" && img.width == 2 && img.height == 2)
    assert(img.features.forall(f => math.abs(f - 1.0f) < 1e-6))

    // unknown container → deterministic stub fallback, pipeline keeps moving
    val other = RealBinaryDecoder.decode(
      MediaRecord(3L, "image", "not media".getBytes("US-ASCII")))
    assert(other.media_id == 3L && other.byte_len == 9)
  }
}
