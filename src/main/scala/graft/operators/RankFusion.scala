package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009) — the
  * standard score-free combiner for hybrid retrieval: given N ranked runs
  * over the same (query, item) space, fused(q, i) = Σ_runs 1/(k + rank),
  * items absent from a run contribute nothing. Rank-based, so a sparse
  * (BM25) and a dense (cosine KNN) run fuse without any score
  * calibration — exactly why hybrid stacks default to it.
  *
  * Determinism: each run's term is a fixed 1/(k + rank) double and the
  * fused score adds terms in DECLARED run order (a left-fold of outer
  * joins, one coalesce per run), so two engines agree bitwise; final ties
  * break on item id.
  *
  * Scale shape: runs are top-k-sized (queries × k rows), not corpus-sized
  * — the joins and the per-query re-rank window all operate on candidate
  * lists a planner can hash or broadcast freely. The expensive part of
  * hybrid retrieval is producing the runs ([[Bm25]], [[Similarity]]);
  * fusion is a cheap afterburner by construction.
  */
object RankFusion {

  /** Fuse ranked runs — each a (query_id, item_id, rank) frame, rank
    * 1-based — into (query_id, item_id, rrf, rank): the top `topK` fused
    * items per query, best first.
    */
  def rrf(runs: Seq[DataFrame], k: Int = 60, topK: Int = 10): DataFrame = {
    require(runs.nonEmpty, "need at least one run")
    require(k >= 1 && topK >= 1, s"k and topK must be >= 1, got k=$k topK=$topK")
    val terms = runs.zipWithIndex.map { case (r, i) =>
      r.select(col("query_id"), col("item_id"),
        (lit(1.0) / (lit(k.toDouble) + col("rank").cast("double")))
          .as(s"__t$i"))
    }
    val joined = terms.reduce((a, b) =>
      a.join(b, Seq("query_id", "item_id"), "full_outer"))
    val fused = terms.indices
      .map(i => coalesce(col(s"__t$i"), lit(0.0)))
      .reduce(_ + _)
    val w = Window.partitionBy("query_id").orderBy(desc("rrf"), col("item_id"))
    joined.withColumn("rrf", fused)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "item_id", "rrf", "rank")
  }
}
