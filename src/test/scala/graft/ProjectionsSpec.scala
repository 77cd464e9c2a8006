package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Projections

class ProjectionsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("projection equals the hand-computed signed sums") {
    val x = Array.tabulate(8)(i => (i + 1).toFloat)
    val df = Seq((1L, x.toSeq)).toDF("vec_id", "embedding")
    val got = Projections.randomProjection(df, "embedding", d = 8, k = 4)
      .select("embedding").as[Seq[Double]].collect().head
    val exp = (0 until 4).map { j =>
      var s = 0.0
      (0 until 8).foreach(i => s += x(i).toDouble * Projections.sign(0, j, i))
      s / math.sqrt(4.0)
    }
    assert(got == exp)
  }

  test("sign formula is stable (golden values pin the cross-engine contract)") {
    // first hex digit parity of md5("rp:0:<j>:<i>") — any change breaks
    // every stored projection and the q136 oracle
    val golden = Seq((0, 0) -> 1.0, (0, 1) -> -1.0, (0, 2) -> -1.0,
      (1, 0) -> 1.0, (2, 5) -> 1.0, (3, 7) -> -1.0)
    golden.foreach { case ((j, i), s) =>
      assert(Projections.sign(0, j, i) == s, s"sign(0,$j,$i)")
    }
  }

  test("squared norms are preserved in expectation (JL contract)") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(200)(v =>
      (v.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val projected = Projections.randomProjection(df, "embedding", 64, 32)
      .select("vec_id", "embedding").as[(Long, Seq[Double])].collect().toMap
    val ratios = vecs.map { case (id, x) =>
      val orig = x.map(v => v.toDouble * v).sum
      val proj = projected(id).map(v => v * v).sum
      proj / orig
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.85 && mean < 1.15, s"mean norm ratio $mean")
  }

  test("projection is a single zero-shuffle pass") {
    val df = Seq((1L, Seq.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val plan = Projections.randomProjection(df, "embedding", 8, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }
}
