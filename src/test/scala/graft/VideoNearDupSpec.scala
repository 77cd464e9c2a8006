package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recall/precision contract of the q241 video near-dup gate: every
  * planted brightness-shifted copy is recovered through per-frame dHash
  * identity (the shift is invisible to the gradient hash) and no
  * cross-video pair leaks past the set-Jaccard threshold.
  */
class VideoNearDupSpec extends AnyFunSuite {
  test("q241 finds exactly the 25 planted copies at jaccard 0.75") {
    val spark = SparkTestSession.spark
    val rows = SparkEntry.queries("q241_video_near_dup")(
      spark, SparkTestSession.sfDir).collect()
    assert(rows.length == 25)
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0 until 25).map(k => (k.toLong, 2000L + k)).toSet)
    // original: 7 frame hashes; copy: 6 shared + 1 new = 7 →
    // J = 6 / (7 + 7 - 6) = 0.75 exactly, for every planted pair
    rows.foreach { r =>
      assert(r.getAs[Long]("inter") == 6L)
      assert(r.getAs[Double]("jaccard") == 0.75)
    }
  }
}
