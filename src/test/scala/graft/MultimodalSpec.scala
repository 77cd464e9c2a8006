package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.multimodal._

/** Multimodal plumbing: binary columns, partition-batched stub decode,
  * frame sampling, resize metadata.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val media = MultimodalOps.textAsMedia(
    Tables.documents(spark, SparkTestSession.sfDir), "doc_id", "text")
    .as[MediaRecord]

  lazy val decoded = MultimodalOps.decodeAll(media, StubDecoder).cache()

  test("decode is deterministic and byte-faithful") {
    val again = MultimodalOps.decodeAll(media, StubDecoder)
    assert(decoded.toDF().exceptAll(again.toDF()).count() == 0)
    // byte_len equals the UTF-8 length of the source text
    val src = Tables.documents(spark, SparkTestSession.sfDir)
      .select(col("doc_id").as("media_id"),
        octet_length(encode(col("text"), "UTF-8")).as("expected_len"))
    val joined = decoded.toDF().join(src, "media_id")
    assert(joined.filter(col("byte_len") =!= col("expected_len")).count() == 0)
  }

  test("features are a normalized 16-bin histogram") {
    val row = decoded.filter(col("media_id") === 0).head()
    val feats = row.features
    assert(feats.length == 16)
    assert(math.abs(feats.sum - 1.0f) < 1e-3)
  }

  test("frame sampling yields every Nth frame for videos only") {
    val frames = MultimodalOps.sampleFrames(decoded, everyN = 10)
    val kinds = decoded.toDF().select("media_id", "kind", "n_frames")
    val joined = frames.join(kinds, "media_id")
    assert(joined.filter(col("kind") =!= "video").count() == 0)
    assert(frames.filter(col("frame_idx") % 10 =!= 0).count() == 0)
    val maxCheck = joined.filter(col("frame_idx") >= col("n_frames")).count()
    assert(maxCheck == 0)
  }

  test("resize clamps the long edge preserving aspect") {
    val resized = MultimodalOps.resizeMeta(decoded.toDF(), maxEdge = 256)
    assert(resized.filter(greatest(col("out_width"), col("out_height")) > 256).count() == 0)
    // untouched when already small enough
    assert(resized.filter(greatest(col("width"), col("height")) <= 256
      && (col("out_width") =!= col("width") || col("out_height") =!= col("height")))
      .count() == 0)
  }

  test("audio chunks tile the sample stream exactly, partial tail flagged") {
    val chunks = MultimodalOps.audioChunks(decoded.toDF(),
      windowMs = 10, sampleRateHz = 16000) // 160 samples per chunk
    // chunks are consecutive, gapless, and their union is [0, n_samples)
    val bad = chunks
      .join(decoded.toDF().select(col("media_id"),
        col("byte_len").cast("long").as("n")), "media_id")
      .filter(col("start_sample") =!= col("chunk_idx") * 160 ||
        col("end_sample") <= col("start_sample") ||
        col("end_sample") > col("n") ||
        (col("is_partial") && col("end_sample") =!= col("n")) ||
        (!col("is_partial") && col("end_sample") - col("start_sample") =!= 160))
    assert(bad.count() == 0)
    // per-media totals: Σ chunk lengths = n_samples; exactly one last chunk
    val tot = chunks.groupBy("media_id")
      .agg(sum(col("end_sample") - col("start_sample")).as("covered"),
        max(col("end_sample")).as("last"))
      .join(decoded.toDF().filter(col("kind") === "audio")
        .select(col("media_id"), col("byte_len").cast("long").as("n")), "media_id")
    assert(tot.filter(col("covered") =!= col("n") || col("last") =!= col("n"))
      .count() == 0)
    // rejects windows that don't hold a whole number of samples
    intercept[IllegalArgumentException] {
      MultimodalOps.audioChunks(decoded.toDF(), windowMs = 1, sampleRateHz = 44100)
    }
  }

  test("tile grid covers every pixel once, edge tiles clipped") {
    val tiles = MultimodalOps.tileGrid(decoded.toDF(), tile = 224)
    val withDims = tiles.join(
      decoded.toDF().select(col("media_id"), col("width"), col("height")),
      "media_id")
    // every tile inside the image, none empty, edge tiles exactly reach it
    assert(withDims.filter(col("x0") + col("w") > col("width") ||
      col("y0") + col("h") > col("height") ||
      col("w") <= 0 || col("h") <= 0).count() == 0)
    // Σ tile areas = width × height per image (exact cover, no overlap by
    // construction of the disjoint grid offsets)
    val area = withDims.groupBy("media_id", "width", "height")
      .agg(sum(col("w").cast("long") * col("h")).as("covered"))
      .filter(col("covered") =!= col("width").cast("long") * col("height"))
    assert(area.count() == 0)
  }
}
