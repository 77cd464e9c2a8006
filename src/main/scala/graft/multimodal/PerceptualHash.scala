package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual (difference-hash) image near-duplication — the visual
  * analogue of the SimHash text path: a 64-bit dHash per image (9x8
  * grid of cell means, each bit = "right cell brighter than left"),
  * banded into 4 x 16-bit LSH keys so candidate pairs come from a
  * bucket equi-join instead of all pairs, then exact Hamming
  * verification on the candidates only.
  *
  * dHash is gradient-based, so it is invariant to uniform brightness
  * shifts and robust to small pixel perturbations — the properties that
  * make it the standard cheap near-dup fingerprint for images
  * (cf. the pHash/dHash family popularized by the ImageHash library).
  *
  * Exactness for the oracle: cell means are compared CROSS-MULTIPLIED
  * (sumR·nL > sumL·nR) — pure integer arithmetic, no float division —
  * and the band values are plain bit sums, so when the grid divides the
  * image evenly the whole hash replays in SQL from pixel values alone.
  *
  * 100 TB shape: hashing is per-row work over the decoded raster (no
  * shuffle); the band explode is 4 rows/image; candidates shuffle on
  * (band_idx, band_val) — never all-pairs. The pair frame is a
  * row-multiplying join, so both sides carry SHUFFLE_HASH pins (and the
  * NoBroadcastOverExpansion rule backstops the shape engine-wide).
  */
object PerceptualHash {

  val Bands = 4
  val BitsPerBand = 16

  /** The 4 x 16-bit dHash bands of a row-major grayscale raster (values
    * 0-255). Grid cells are the integer partition floor(c·w/9) x
    * floor(r·h/8), so any raster ≥ 9x8 hashes; equal-cell images (w%9==0,
    * h%8==0) make the comparison a plain sum compare.
    */
  def dHashBands(pixels: Array[Int], w: Int, h: Int): Array[Int] = {
    require(w >= 9 && h >= 8, s"raster must be at least 9x8, got ${w}x$h")
    require(pixels.length == w * h, s"raster ${pixels.length} != ${w}x$h")
    val xb = Array.tabulate(10)(c => c * w / 9)
    val yb = Array.tabulate(9)(r => r * h / 8)
    val sums = Array.ofDim[Long](8, 9)
    val counts = Array.ofDim[Long](8, 9)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        var s = 0L; var n = 0L
        var y = yb(cy)
        while (y < yb(cy + 1)) {
          var x = xb(cx)
          while (x < xb(cx + 1)) { s += pixels(y * w + x); n += 1; x += 1 }
          y += 1
        }
        sums(cy)(cx) = s; counts(cy)(cx) = n
        cx += 1
      }
      cy += 1
    }
    val bands = new Array[Int](Bands)
    cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        // mean(right) > mean(left), cross-multiplied: exact in integers
        val bit =
          if (sums(cy)(cx + 1) * counts(cy)(cx) >
              sums(cy)(cx) * counts(cy)(cx + 1)) 1 else 0
        val idx = cy * 8 + cx
        bands(idx / BitsPerBand) |= bit << (idx % BitsPerBand)
        cx += 1
      }
      cy += 1
    }
    bands
  }

  /** The 64-bit dHash (band 0 in the low bits). */
  def dHash64(pixels: Array[Int], w: Int, h: Int): Long = {
    val b = dHashBands(pixels, w, h)
    b.indices.foldLeft(0L)((acc, i) => acc | ((b(i).toLong & 0xFFFFL) << (BitsPerBand * i)))
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Band rows `(id, band_key)` of a hash frame — `band_key` packs the
    * LSH bucket `(band_idx, band_val)` into one int
    * (band_idx·2^16 + band_val), the storage key of a persisted band
    * index: sorted by band_key at ingest, parquet row-group stats make a
    * pushed key filter skip everything outside the probed buckets.
    */
  def bandKeys(hashes: DataFrame, idCol: String): DataFrame =
    hashes.select(
      col(idCol).as("id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
      .toDF("id", "band_idx", "band_val")
      .select(col("id"),
        (col("band_idx") * lit(1 << BitsPerBand) + col("band_val"))
          .as("band_key"))

  /** Near-duplicates of a NEW batch against an INGESTED corpus — the
    * incremental shape a 100 TB multimodal pipeline actually runs (new
    * shards dedup against the corpus index, never batch-all-pairs, the
    * q123/q127 text discipline applied to q232's dHash bands):
    * candidates come from the PERSISTED band index (`index` =
    * [[bandKeys]] rows written at ingest, sorted by band_key) probed
    * with the batch's distinct band keys — bounded driver state
    * (≤ [[Bands]]·|batch| ints, the batch is small by contract: it is
    * the incremental arrival) pushed as an In filter that reaches the
    * parquet scan's row-group stats — then exact Hamming ≤ `maxHamming`
    * verified against `corpusHashes` restricted to the candidates.
    * Output: (id_new, id_corpus, hamming). Batch-derived frames ride
    * explicit broadcasts (bounded 4 rows/image — the expansion is
    * constant, unlike the corpus-growing shapes
    * NoBroadcastOverExpansion exists for), so the corpus side is never
    * shuffled.
    */
  def incrementalNearDupPairs(index: DataFrame, corpusHashes: DataFrame,
      batchHashes: DataFrame, idCol: String, maxHamming: Int): DataFrame = {
    val bBands = bandKeys(batchHashes, idCol).toDF("id_new", "band_key")
    val keys = bBands.select("band_key").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val cand = index.filter(col("band_key").isin(keys: _*))
      .join(broadcast(bBands), Seq("band_key"))
      .select(col("id_new"), col("id").as("id_corpus"))
      .distinct()
    val a = batchHashes.select(col(idCol).as("id_new"),
      col("b0").as("a0"), col("b1").as("a1"),
      col("b2").as("a2"), col("b3").as("a3"))
    val b = corpusHashes.select(col(idCol).as("id_corpus"),
      col("b0").as("c0"), col("b1").as("c1"),
      col("b2").as("c2"), col("b3").as("c3"))
    b.join(broadcast(cand.join(broadcast(a), "id_new")), Seq("id_corpus"))
      .withColumn("hamming",
        expr("bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3)").cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("id_new", "id_corpus", "hamming")
  }

  /** Near-duplicate pairs from a hash frame `(idCol, b0, b1, b2, b3)`:
    * candidates = images sharing ≥1 identical 16-bit band (LSH bucket
    * join — Hamming ≤ 3 is GUARANTEED to share a band by pigeonhole;
    * larger radii are caught with the usual LSH probability), then exact
    * Hamming ≤ `maxHamming` verified on candidates only. Output:
    * (id_a, id_b, hamming), id_a < id_b.
    */
  def nearDupPairs(hashes: DataFrame, idCol: String, maxHamming: Int): DataFrame = {
    val bands = hashes.select(
      col(idCol).as("id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
      .toDF("id", "band_idx", "band_val")
    // pair frame: row-multiplying join — pin SHUFFLE_HASH on both sides
    // (a statically size-broadcast expansion cannot be demoted by AQE)
    val cand = bands.as("x").hint("shuffle_hash")
      .join(bands.as("y").hint("shuffle_hash"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val a = hashes.select(col(idCol).as("id_a"),
      col("b0").as("a0"), col("b1").as("a1"),
      col("b2").as("a2"), col("b3").as("a3"))
    val b = hashes.select(col(idCol).as("id_b"),
      col("b0").as("c0"), col("b1").as("c1"),
      col("b2").as("c2"), col("b3").as("c3"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("hamming",
        expr("bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3)").cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
