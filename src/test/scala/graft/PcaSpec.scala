package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

class PcaSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // anisotropic 3D cloud: dominant direction (1, 1, 0)/√2, then z, then
  // the (1, -1, 0) residual
  private def cloud(n: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(11)
    Seq.tabulate(n) { v =>
      val a = rnd.nextGaussian() * 10
      val b = rnd.nextGaussian() * 0.5
      val c = rnd.nextGaussian() * 2
      (v.toLong, Seq((a + b).toFloat, (a - b).toFloat, (5 + c).toFloat))
    }
  }

  test("jacobi eigensolver recovers a known symmetric spectrum") {
    // A = diag(3, 1) rotated 45°: eigvals {3, 1}, first vector (1, 1)/√2
    val m = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (vals, vecs) = Pca.jacobiEigen(m)
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    assert(math.abs(vecs(0)(0) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(vecs(0)(1) - math.sqrt(0.5)) < 1e-12)
  }

  test("fitted basis is orthonormal with descending nonnegative eigenvalues") {
    val model = Pca.fit(cloud(500).toDF("vec_id", "embedding").repartition(7),
      "embedding", d = 3)
    val b = model.basis
    for (i <- b.indices; j <- b.indices) {
      val dot = b(i).zip(b(j)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j)=$dot")
    }
    assert(model.eigenvalues == model.eigenvalues.sorted.reverse)
    assert(model.eigenvalues.forall(_ > -1e-9))
    // dominant direction ~ (1, 1, 0)/√2
    assert(math.abs(math.abs(model.basis.head(0)) - math.sqrt(0.5)) < 0.05)
    assert(math.abs(model.basis.head(2)) < 0.1)
  }

  test("projection is centered and carries the component variances") {
    val df = cloud(500).toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", d = 3)
    val proj = Pca.project(df, "embedding", model, k = 2)
      .select("embedding").as[Seq[Double]].collect()
    val n = proj.length.toDouble
    (0 until 2).foreach { j =>
      val mean = proj.map(_(j)).sum / n
      val varJ = proj.map(v => (v(j) - mean) * (v(j) - mean)).sum / n
      assert(math.abs(mean) < 1e-6, s"component $j mean $mean")
      assert(math.abs(varJ - model.eigenvalues(j)) < model.eigenvalues(j) * 0.01 + 1e-6,
        s"component $j variance $varJ vs ${model.eigenvalues(j)}")
    }
  }

  test("whitening yields unit component variance") {
    val df = cloud(500).toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", d = 3)
    val white = Pca.whiten(df, "embedding", model, k = 3)
      .select("embedding").as[Seq[Double]].collect()
    val n = white.length.toDouble
    (0 until 3).foreach { j =>
      val varJ = white.map(v => v(j) * v(j)).sum / n
      assert(math.abs(varJ - 1.0) < 0.02, s"component $j variance $varJ")
    }
  }

  test("applying a fitted model is a single zero-shuffle pass") {
    val df = cloud(50).toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", d = 3)
    val plan = Pca.whiten(df, "embedding", model, k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }

  test("fit ignores malformed rows and survives an empty frame") {
    val df = Seq((1L, null.asInstanceOf[Seq[Float]]), (2L, Seq(1.0f)))
      .toDF("vec_id", "embedding")
    val model = Pca.fit(df.filter(col("vec_id") < 0), "embedding", d = 3)
    assert(model.eigenvalues.forall(_ == 0.0)) // n floored at 1, zero moments
    val model2 = Pca.fit(df, "embedding", d = 3) // null + short row skipped
    assert(model2.mean.forall(_ == 0.0))
  }
}
