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
}
