package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** PCA / whitening for embedding columns — the standard preprocessing in
  * front of semantic dedup and ANN (SemDeDup, Abbas et al. 2023, clusters
  * normalized embeddings; whitening equalizes component variance so cosine
  * buckets aren't dominated by a few high-variance axes).
  *
  * Scale shape: fitting is ONE corpus pass — each partition accumulates
  * (n, Σx, Σxxᵀ) imperatively (`mapPartitions` is the honest tool here:
  * a d×d outer-product accumulator has no declarative form that isn't a
  * d²-row explode) and only the per-partition summaries (d(d+1)/2 + d + 1
  * doubles each) reach the driver, which merges them in partition order
  * and runs a cyclic Jacobi eigensolver on the d×d covariance — O(d³)
  * driver work, microseconds at embedding dims. Applying the fitted basis
  * is a single zero-shuffle [[graft.expressions.ArrayMatMul]] projection
  * with the mean folded in as the kernel's affine offset.
  */
object Pca {

  /** Fitted model: mean, eigenvectors (rows, variance-descending), and
    * eigenvalues of the covariance. Eigenvectors are sign-canonicalized
    * (largest-|component| positive) so refits are comparable.
    */
  final case class Model(mean: Seq[Double], basis: Seq[Seq[Double]],
      eigenvalues: Seq[Double])

  /** One-pass moment accumulation + driver-side eigensolve. */
  def fit(df: DataFrame, embCol: String, d: Int): Model = {
    require(d >= 1, s"dim must be positive, got $d")
    val tri = d * (d + 1) / 2
    val summaries = df.select(col(embCol)).na.drop()
      .mapPartitions { it =>
        val sums = new Array[Double](d)
        val outer = new Array[Double](tri)
        var n = 0L
        it.foreach { row =>
          val arr = row.getSeq[Float](0)
          if (arr != null && arr.length >= d) {
            var i = 0
            var t = 0
            while (i < d) {
              val xi = arr(i).toDouble
              sums(i) += xi
              var j = 0
              while (j <= i) { outer(t) += xi * arr(j).toDouble; t += 1; j += 1 }
              i += 1
            }
            n += 1
          }
        }
        Iterator.single((n, sums.toSeq, outer.toSeq))
      }(org.apache.spark.sql.Encoders.product[(Long, Seq[Double], Seq[Double])])
      .collect()

    val n = math.max(summaries.map(_._1).sum, 1L).toDouble
    val sums = new Array[Double](d)
    val outer = new Array[Double](tri)
    summaries.foreach { case (_, s, o) =>
      var i = 0
      while (i < d) { sums(i) += s(i); i += 1 }
      var t = 0
      while (t < tri) { outer(t) += o(t); t += 1 }
    }
    val mean = sums.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        val c = outer(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    Model(mean.toSeq, eigVecs.map(_.toSeq).toSeq, eigVals.toSeq)
  }

  /** Project onto the top-k principal components (centered). */
  def project(df: DataFrame, embCol: String, model: Model, k: Int): DataFrame =
    transform(df, embCol, model, k, whiten = false)

  /** Project AND divide each component by √(λ + eps): unit-variance output. */
  def whiten(df: DataFrame, embCol: String, model: Model, k: Int,
      eps: Double = 1e-9): DataFrame =
    transform(df, embCol, model, k, whiten = true, eps)

  /** The exact (rows, divisors, offsets) triple the projection kernel runs
    * with — public so an oracle can replay out[j] = Σxᵢwⱼᵢ / divⱼ − offⱼ
    * digit-for-digit from the same driver doubles (see q137's dynamic
    * oracle). The affine offset = (V·μ)/div folds mean-centering into the
    * kernel (V·(x−μ) = V·x − V·μ).
    */
  def affineParams(model: Model, k: Int, whiten: Boolean,
      eps: Double = 1e-9): (Seq[Seq[Double]], Seq[Double], Seq[Double]) = {
    require(k >= 1 && k <= model.basis.length,
      s"k must be in [1, ${model.basis.length}], got $k")
    val rows = model.basis.take(k)
    val divisors =
      if (whiten) model.eigenvalues.take(k).map(l => math.sqrt(math.max(l, 0) + eps))
      else Seq.fill(k)(1.0)
    val offsets = rows.zip(divisors).map { case (r, dv) =>
      r.zip(model.mean).map { case (a, b) => a * b }.sum / dv
    }
    (rows, divisors, offsets)
  }

  private def transform(df: DataFrame, embCol: String, model: Model, k: Int,
      whiten: Boolean, eps: Double = 0.0): DataFrame = {
    val (rows, divisors, offsets) = affineParams(model, k, whiten, eps)
    df.withColumn(embCol,
      ColumnBridge.column(graft.expressions.ArrayMatMul(
        ColumnBridge.expression(col(embCol)), rows, divisors, offsets)))
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: rotations kill each
    * off-diagonal element per sweep until convergence. Returns
    * (eigenvalues, eigenvector rows) sorted variance-descending,
    * sign-canonicalized. Textbook-public numerical method (Golub & Van
    * Loan §8.5); d is an embedding dim, so O(d³) driver work is free.
    */
  private[graft] def jacobiEigen(
      a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a.length
    val m = a.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += m(i)(j) * m(i)(j); j += 1 }
        i += 1
      }
      s
    }

    var sweep = 0
    while (sweep < 50 && offDiag() > 1e-20) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(m(p)(q)) > 1e-300) {
            val theta = (m(q)(q) - m(p)(p)) / (2 * m(p)(q))
            val tRot =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
              else 1.0 / (theta - math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(tRot * tRot + 1)
            val s = tRot * c
            var i = 0
            while (i < n) {
              val mip = m(i)(p); val miq = m(i)(q)
              m(i)(p) = c * mip - s * miq
              m(i)(q) = s * mip + c * miq
              i += 1
            }
            i = 0
            while (i < n) {
              val mpi = m(p)(i); val mqi = m(q)(i)
              m(p)(i) = c * mpi - s * mqi
              m(q)(i) = s * mpi + c * mqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }

    val order = (0 until n).sortBy(i => -m(i)(i))
    val vals = order.map(i => m(i)(i)).toArray
    val vecs = order.map { e =>
      val col = Array.tabulate(n)(i => v(i)(e))
      val dom = col.indices.maxBy(i => math.abs(col(i)))
      if (col(dom) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }
}
