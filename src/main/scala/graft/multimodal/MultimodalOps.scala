package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the engine as
  * opaque `binary` columns plus typed metadata, with decode/feature-extract
  * as batch-shaped per-partition transforms.
  *
  * The decode step is a seam ([[MediaDecoder]]): this container has no
  * image/audio libraries, so [[StubDecoder]] produces a deterministic fake
  * (dimensions and features derived from the bytes themselves) while the
  * Spark-side plumbing — schema, partition-wise batching, column shapes — is
  * real and tested. A production decoder (JavaCV, TwelveMonkeys, ffmpeg via
  * JNI) drops in without touching any caller.
  */
final case class MediaRecord(
    media_id: Long, kind: String, content: Array[Byte])

final case class DecodedMedia(
    media_id: Long, kind: String, byte_len: Int, width: Int, height: Int,
    n_frames: Int, features: Array[Float])

trait MediaDecoder extends Serializable {
  def decode(r: MediaRecord): DecodedMedia
}

/** Deterministic fake decoder: dimensions from a byte-hash, features from a
  * 16-bin byte histogram. Stands in for the real decode; everything
  * downstream (schemas, partitioning, feature math) is production-shaped.
  */
object StubDecoder extends MediaDecoder {
  override def decode(r: MediaRecord): DecodedMedia = {
    val h = java.util.Arrays.hashCode(r.content)
    val hist = new Array[Float](16)
    r.content.foreach(b => hist((b & 0xFF) / 16) += 1f)
    val n = math.max(r.content.length, 1).toFloat
    DecodedMedia(
      media_id = r.media_id,
      kind = r.kind,
      byte_len = r.content.length,
      width = 64 + math.floorMod(h, 1024),
      height = 64 + math.floorMod(h >> 10, 1024),
      n_frames = if (r.kind == "video") 1 + math.floorMod(h >> 20, 300) else 1,
      features = hist.map(_ / n))
  }
}

object MultimodalOps {

  /** Decode per partition — the Scala analogue of a pandas-batch UDF: one
    * decoder instance per partition, records streamed through it, output as
    * a typed Dataset. Partition size (spark.sql.files.maxPartitionBytes)
    * controls the memory envelope of in-flight decoded media.
    */
  def decodeAll(media: Dataset[MediaRecord], decoder: MediaDecoder): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decoder.decode))
  }

  /** Deterministic frame sampling for video-kind records: every `everyN`-th
    * frame index up to the decoded frame count (metadata-level; a real
    * pipeline would carry frame bytes in a nested array<binary>).
    */
  def sampleFrames(decoded: Dataset[DecodedMedia], everyN: Int): DataFrame =
    decoded.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))).as("frame_idx"))

  /** Resize metadata transform: clamp the longer edge to `maxEdge`,
    * preserving aspect ratio (integer math, deterministic).
    */
  def resizeMeta(decoded: DataFrame, maxEdge: Int): DataFrame = {
    val scaleNeeded = greatest(col("width"), col("height")) > maxEdge
    val scale = lit(maxEdge).cast("double") / greatest(col("width"), col("height"))
    decoded
      .withColumn("out_width",
        when(scaleNeeded, floor(col("width") * scale).cast("int")).otherwise(col("width")))
      .withColumn("out_height",
        when(scaleNeeded, floor(col("height") * scale).cast("int")).otherwise(col("height")))
  }

  /** Fixed-duration audio chunk layout for audio-kind records — the
    * batching step before transcription/feature extraction (a 3-hour
    * recording becomes N windows a worker can decode independently).
    * Metadata-level and integer-exact: the stub treats `byte_len` as the
    * sample count (8-bit mono); chunk i covers samples
    * [i·spc, min((i+1)·spc, n)) where spc = windowMs·rate/1000, with a
    * final partial window flagged rather than dropped (transcription
    * must cover the tail). One generator over the scan — no join, no
    * shuffle; chunk bytes would ride a later per-partition decode exactly
    * like [[decodeAll]].
    */
  def audioChunks(decoded: DataFrame, windowMs: Int,
      sampleRateHz: Int): DataFrame = {
    require(windowMs > 0, s"windowMs must be > 0, got $windowMs")
    require(sampleRateHz > 0, s"sampleRateHz must be > 0, got $sampleRateHz")
    require(windowMs.toLong * sampleRateHz % 1000L == 0,
      s"window must hold a whole number of samples: $windowMs ms at $sampleRateHz Hz")
    val spc = windowMs.toLong * sampleRateHz / 1000L
    decoded
      .filter(col("kind") === "audio" && col("byte_len") > 0)
      .select(col("media_id"), col("byte_len").cast("long").as("n_samples"))
      .select(col("media_id"), col("n_samples"),
        explode(sequence(lit(0L),
          floor((col("n_samples") - 1) / spc).cast("long"))).as("chunk_idx"))
      .select(col("media_id"), col("chunk_idx"),
        (col("chunk_idx") * spc).as("start_sample"),
        least(col("chunk_idx") * spc + spc, col("n_samples")).as("end_sample"))
      .withColumn("duration_ms",
        (col("end_sample") - col("start_sample")) * lit(1000.0) /
          lit(sampleRateHz))
      .withColumn("is_partial",
        col("end_sample") - col("start_sample") < spc)
  }

  /** Tile-grid layout for image-kind records — the patching step a
    * vision encoder or a tiled high-resolution pipeline runs before
    * embedding (each tile becomes one unit of decode + inference work).
    * Edge tiles CLIP to the image instead of padding or dropping: the
    * grid must cover every pixel exactly once, and the consumer decides
    * its own padding policy. Integer arithmetic only; two generators
    * over the scan (Spark 4 forbids nested generators in one projection),
    * zero shuffles.
    */
  def tileGrid(decoded: DataFrame, tile: Int): DataFrame = {
    require(tile > 0, s"tile must be > 0, got $tile")
    decoded
      .filter(col("kind") === "image" &&
        col("width") > 0 && col("height") > 0)
      .select(col("media_id"), col("width"), col("height"))
      .select(col("media_id"), col("width"), col("height"),
        explode(sequence(lit(0),
          floor((col("height") - 1) / tile).cast("int"))).as("tile_y"))
      .select(col("media_id"), col("width"), col("height"), col("tile_y"),
        explode(sequence(lit(0),
          floor((col("width") - 1) / tile).cast("int"))).as("tile_x"))
      .select(col("media_id"), col("tile_x"), col("tile_y"),
        (col("tile_x") * tile).as("x0"),
        (col("tile_y") * tile).as("y0"),
        least(lit(tile), col("width") - col("tile_x") * tile).as("w"),
        least(lit(tile), col("height") - col("tile_y") * tile).as("h"))
  }

  /** Wrap a text table as binary media records — the test/demo corpus for
    * the plumbing (documents bytes stand in for media bytes).
    */
  def textAsMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      // deterministic kind assignment spreads records across modalities
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("content"))
}
