package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — the harness that makes an approximate
  * ANN path (LSH, IVF, PQ, random projection) accountable to the exact
  * baseline: per query, how much of the true top-k did the shortlist
  * recover (recall@k) and where did the true nearest neighbor land
  * (reciprocal rank). This is how a 100 TB index rollout is judged —
  * evaluate on a query sample, compare recall against the SLA, then ship —
  * so it belongs next to the index builders as a first-class operator.
  *
  * Inputs are two ranked frames shaped like the KNN operators' output
  * (query_id, neighbor_id, rank); cost is a couple of (queries × k)-row
  * joins — negligible next to the searches themselves, and fully
  * declarative (broadcastable both sides).
  */
object RetrievalEval {

  /** Per-query: (query_id, n_hits, recall, top1_rr). `n_hits` counts the
    * truth top-k found anywhere in the approx top-k; `top1_rr` is the
    * reciprocal of the approx rank of the TRUE nearest neighbor (0 when
    * the shortlist misses it entirely). Every query in `truth` gets a row.
    */
  def compare(truth: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val t = truth.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val a = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    val hits = t
      .join(a.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    val rr = truth.filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id"))
      .join(a, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"),
        coalesce(lit(1.0) / col("rank"), lit(0.0)).as("top1_rr"))
    t.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .join(rr, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall"),
        coalesce(col("top1_rr"), lit(0.0)).as("top1_rr"))
  }
}
