package graft.multimodal

/** Perceptual audio near-duplication fingerprint — the acoustic analogue
  * of [[PerceptualHash]]'s image dHash, completing the media dedup trio
  * (byte-exact → visual q232 → audio): a 64-bit signature from the SIGN
  * of consecutive frame-energy differences, after Haitsma & Kalker, "A
  * Highly Robust Audio Fingerprinting System" (ISMIR 2002), whose
  * sub-fingerprints are exactly sign(energy difference) bits over
  * time-frequency bands. This is the time-axis simplification (energy
  * envelope only): robust to small sample perturbations and uniform gain
  * changes that leave the envelope shape intact, while clips with
  * different envelopes land far apart in Hamming space.
  *
  * Exactness for the oracle: 16-bit PCM samples are integers, so frame
  * energies (Σ s², ≤ 2^41 for gate-sized clips) are exact BIGINTs in
  * both engines, and frame-length differences from the integer grid
  * partition are handled by CROSS-MULTIPLYING the mean-energy compare
  * (e·n' > e'·n) — no float division anywhere, the whole hash chain
  * replays in SQL from the sample closed form (q235).
  *
  * 100 TB shape: fingerprinting is per-row work over the decoded PCM (no
  * shuffle; the decode itself is the partition-local [[Codecs]] walk);
  * the 4 x 16-bit bands feed the SAME banded-LSH candidate join as the
  * image path ([[PerceptualHash.nearDupPairs]] — shared machinery, both
  * SHUFFLE_HASH-pinned), so candidates shuffle on band buckets and the
  * quadratic all-pairs frame never exists.
  */
object AudioFingerprint {

  val Frames = 65 // 64 difference bits = 4 x 16-bit LSH bands

  /** The 4 x 16-bit energy-difference bands of a mono PCM clip. Frame
    * boundaries are the integer partition floor(f·n/65) (same grid rule
    * as [[PerceptualHash.dHashBands]]); bit f = "frame f+1 has higher
    * mean energy than frame f", cross-multiplied exactly.
    */
  def energyDiffBands(samples: Array[Short]): Array[Int] = {
    val n = samples.length
    require(n >= Frames, s"clip must have at least $Frames samples, got $n")
    // cross-multiply bound: e·n' ≤ (L·2^30)·L with L = frame length;
    // safe in a signed 64-bit long up to ~92k samples/frame
    require(n <= 5_900_000, s"clip too long for exact integer compare: $n")
    val xb = Array.tabulate(Frames + 1)(f => f * n / Frames)
    val energy = new Array[Long](Frames)
    val count = new Array[Long](Frames)
    var f = 0
    while (f < Frames) {
      var e = 0L
      var i = xb(f)
      while (i < xb(f + 1)) {
        val s = samples(i).toLong
        e += s * s
        i += 1
      }
      energy(f) = e
      count(f) = (xb(f + 1) - xb(f)).toLong
      f += 1
    }
    val bands = new Array[Int](PerceptualHash.Bands)
    f = 0
    while (f < Frames - 1) {
      // mean(next) > mean(this), cross-multiplied: exact in integers
      val bit = if (energy(f + 1) * count(f) > energy(f) * count(f + 1)) 1 else 0
      bands(f / PerceptualHash.BitsPerBand) |=
        bit << (f % PerceptualHash.BitsPerBand)
      f += 1
    }
    bands
  }
}
