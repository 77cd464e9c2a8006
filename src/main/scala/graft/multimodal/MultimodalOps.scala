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
