package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AudioFingerprint, Codecs}

/** Energy-difference audio fingerprint kernel: bit semantics, gain
  * invariance (the Haitsma-Kalker property the hash exists for), codec
  * round-trip, and the input guards.
  */
class AudioFingerprintSpec extends AnyFunSuite {

  test("constant signal has no rising-energy bits; a ramp has only them") {
    val flat = Array.fill[Short](650)(100)
    assert(AudioFingerprint.energyDiffBands(flat).toSeq == Seq(0, 0, 0, 0))
    // strictly growing |amplitude| → every frame-to-frame compare rises
    val ramp = Array.tabulate[Short](650)(i => (i + 1).toShort)
    assert(AudioFingerprint.energyDiffBands(ramp).toSeq ==
      Seq(0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF))
  }

  test("fingerprint is invariant under uniform gain") {
    val s = Array.tabulate[Short](1300)(i => (((i * 13 + 7) % 211) - 105).toShort)
    val twice = s.map(v => (v * 2).toShort)
    assert(AudioFingerprint.energyDiffBands(s).toSeq ==
      AudioFingerprint.energyDiffBands(twice).toSeq)
  }

  test("survives a WAV encode/decode round-trip bit-for-bit") {
    val s = Array.tabulate[Short](800)(i => (((i * 31 + 5) % 1999) - 999).toShort)
    val (rate, decoded) = Codecs.decodeWavSamples(Codecs.wavBytes(8000, s))
    assert(rate == 8000)
    assert(decoded.toSeq == s.toSeq)
    assert(AudioFingerprint.energyDiffBands(decoded).toSeq ==
      AudioFingerprint.energyDiffBands(s).toSeq)
  }

  test("guards: too-short and too-long clips are rejected") {
    intercept[IllegalArgumentException](
      AudioFingerprint.energyDiffBands(new Array[Short](64)))
    intercept[IllegalArgumentException](
      AudioFingerprint.energyDiffBands(new Array[Short](5_900_001)))
  }
}
