package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-bucketed batch assignment for large-scale model inference — the
  * serving-side sibling of [[Packing.sequencePacking]] (which concatenates
  * for TRAINING): batch inference pads every sequence in a batch to the
  * longest member, so batching arbitrary lengths together burns compute on
  * pad tokens. The standard fix (any inference stack's `bucket_by_length`)
  * groups sequences into length bands and batches within a band, bounding
  * per-batch padding waste by the band width.
  *
  * Everything is deterministic arithmetic on (length, id) — no RNG, no
  * timestamps — so batch assignments are reproducible across runs and
  * engines, and q160 gates them bit-for-bit.
  *
  * Scale design: batch indices need a per-bucket dense order, but a
  * per-bucket global window would funnel each band through ONE task. Rows
  * are therefore sharded by the stable md5 draw ([[Sampling.hashBucket]])
  * and ordered within (bucket, shard) — `numShards` × buckets parallel
  * window partitions, each holding ~N/(buckets·shards) rows, and a batch
  * never crosses a shard (shard-local batches are what a fleet of
  * inference workers consumes anyway: each worker drains its shard
  * without coordination). Waste accounting is an exact groupBy.
  */
object InferenceBatching {

  /** Bucket index for a length under ascending `boundaries` (end-exclusive
    * upper bounds): lengths < boundaries(0) → 0, … ≥ last boundary → index
    * `boundaries.length` (the overflow band). */
  def lengthBucket(len: Column, boundaries: Seq[Int]): Column = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
      boundaries.distinct == boundaries, s"need ascending distinct boundaries")
    boundaries.zipWithIndex.foldRight(lit(boundaries.length): Column) {
      case ((b, i), rest) => when(len < b, lit(i)).otherwise(rest)
    }
  }

  /** Assign every row a (bucket, shard, batch_idx) triple: bucket from
    * `boundaries` over `lenCol`, shard = the md5 draw of `idCol` mod
    * `numShards`, batch_idx = zero-based position in (lenCol, idCol)
    * order within (bucket, shard), divided by `batchSize`. Adds
    * `pad_len` — the band's padded length for non-overflow buckets (the
    * per-batch pad target a worker allocates), and the row's own length
    * for the unbounded overflow band.
    */
  def assign(df: DataFrame, idCol: String, lenCol: String,
      boundaries: Seq[Int], batchSize: Int, numShards: Int): DataFrame = {
    require(batchSize >= 1 && numShards >= 1)
    val w = Window.partitionBy("bucket", "shard")
      .orderBy(col(lenCol).asc, col(idCol).asc)
    val padTarget = boundaries.zipWithIndex.foldRight(col(lenCol)) {
      case ((b, i), rest) => when(col("bucket") === i, lit(b - 1)).otherwise(rest)
    }
    df.withColumn("bucket", lengthBucket(col(lenCol), boundaries))
      .withColumn("shard", Sampling.hashBucket(col(idCol), numShards))
      .withColumn("batch_idx",
        ((row_number().over(w) - 1) / batchSize).cast("long"))
      .withColumn("pad_len", padTarget.cast("long"))
  }

  /** Per-bucket padding-waste audit: batches pad to the batch MAX (not
    * the band bound), so waste is Σ(batch_max − len) over rows. Columns:
    * bucket, n_rows, n_batches, real_tokens, padded_tokens, waste_frac.
    * The number every serving-capacity plan starts from.
    */
  def wasteReport(df: DataFrame, idCol: String, lenCol: String,
      boundaries: Seq[Int], batchSize: Int, numShards: Int): DataFrame = {
    val assigned = assign(df, idCol, lenCol, boundaries, batchSize, numShards)
    val perBatch = assigned
      .groupBy("bucket", "shard", "batch_idx")
      .agg(count(lit(1)).as("bn"),
        sum(col(lenCol).cast("long")).as("breal"),
        max(col(lenCol).cast("long")).as("bmax"))
    perBatch
      .groupBy("bucket")
      .agg(sum(col("bn")).as("n_rows"),
        count(lit(1)).as("n_batches"),
        sum(col("breal")).as("real_tokens"),
        sum(col("bmax") * col("bn")).as("padded_tokens"))
      .withColumn("waste_frac",
        (col("padded_tokens") - col("real_tokens")).cast("double") /
          col("padded_tokens"))
  }
}
