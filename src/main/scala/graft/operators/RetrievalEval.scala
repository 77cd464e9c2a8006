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

  /** Per-query binary-relevance nDCG@k — the position-sensitive companion
    * to [[compare]]'s recall: a shortlist that finds the right neighbors
    * but ranks them low scores below one that ranks them where the exact
    * search does. Relevance is membership in the truth top-k (graded
    * relevance needs human labels an index rollout doesn't have);
    * DCG = Σ 1/log2(rank_approx + 1) over approx positions holding a true
    * neighbor, IDCG = Σ_{i=1..k} 1/log2(i + 1) (every truth query ranks k
    * candidates here; queries with fewer would need min(k, n_truth)).
    * Same cost shape as [[compare]]: (queries × k)-row joins, both sides
    * broadcastable, nothing corpus-scaled.
    */
  def ndcg(truth: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    // discounts are DRIVER constants folded into the plan as literals (not
    // a column log2): rank space is 1..k, so the k doubles cost nothing,
    // and an oracle replays them digit-for-digit via Double.toString
    // instead of betting that two engines' log agree in the last ulp
    val disc = discounts(k)
    val discCol = disc.zipWithIndex.foldLeft(lit(0.0)) {
      case (acc, (d, i)) => when(col("rank") === (i + 1), lit(d)).otherwise(acc)
    }
    val t = truth.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val a = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    // ordered fold (rank ascending) so the double sum is bit-reproducible
    // at any partitioning — same discipline as the LM kernels. Both sides
    // are (queries × k) eval frames by contract — broadcast explicitly
    // (they are derived aggregates, so the static planner has no stats
    // and would pick a sort-merge join; PlanShapeSpec guards this)
    val dcg = t.join(broadcast(a), Seq("query_id", "neighbor_id"))
      .select(col("query_id"), col("rank"), discCol.as("disc"))
      .groupBy("query_id")
      .agg(aggregate(
        sort_array(collect_list(struct(col("rank"), col("disc")))),
        lit(0.0), (acc, x) => acc + x.getField("disc")).as("dcg"))
    t.select("query_id").distinct()
      .join(broadcast(dcg), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("dcg"), lit(0.0)).as("dcg"),
        (coalesce(col("dcg"), lit(0.0)) / lit(idcgConst(k))).as("ndcg"))
  }

  /** Per-query truncated rank-biased overlap (Webber, Moffat & Zobel,
    * TOIS'10) between the truth and approx top-k rankings — the
    * top-weighted agreement metric for comparing two RANKED lists as
    * lists (recall ignores order; nDCG needs a relevance side; RBO
    * compares the rankings symmetrically, weighting shallow depths most).
    * RBO@k = Σ_{d=1..k} p^(d-1)(1-p) · X_d / d with X_d = |prefix_d(A) ∩
    * prefix_d(B)|. Each common item at ranks (r_t, r_a) contributes to
    * every depth d ≥ max(r_t, r_a), so the sum REARRANGES to one weight
    * lookup per common item: w(m) = Σ_{d=m..k} p^(d-1)(1-p)/d — k DRIVER
    * doubles folded into the plan as literals (same discipline as
    * [[ndcg]]'s discounts; [[rboWeights]] is public so an oracle embeds
    * the identical values). Cost: ONE (queries × k) self-join + an
    * ordered fold — nothing corpus-scaled; inputs persist at the gate.
    */
  def rbo(truth: DataFrame, approx: DataFrame, k: Int,
      p: Double = 0.9): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(p > 0.0 && p < 1.0, s"p must be in (0,1), got $p")
    val w = rboWeights(k, p)
    val wCol = w.zipWithIndex.foldLeft(lit(0.0)) {
      case (acc, (v, i)) => when(col("m") === (i + 1), lit(v)).otherwise(acc)
    }
    val t = truth.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_t"))
    val a = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_a"))
    val common = t.join(broadcast(a), Seq("query_id", "neighbor_id"))
      .select(col("query_id"),
        greatest(col("rank_t"), col("rank_a")).as("m"))
      .select(col("query_id"), col("m"), wCol.as("w"))
      .groupBy("query_id")
      .agg(aggregate(
        sort_array(collect_list(struct(col("m"), col("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("rbo"))
    // keyed on the UNION of both sides' query sets — RBO is symmetric, so a
    // query present only in `approx` must surface (scored 0.0: zero prefix
    // overlap with an absent truth ranking), not silently drop
    t.select("query_id").union(a.select("query_id")).distinct()
      .join(broadcast(common), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("rbo"), lit(0.0)).as("rbo"))
  }

  /** Per-item RBO weights w(m) = Σ_{d=m..k} p^(d-1)(1-p)/d for m = 1..k,
    * folded high-depth-first so each prefix sum is a fixed double — public
    * so oracle SQL embeds the identical values. */
  def rboWeights(k: Int, p: Double): IndexedSeq[Double] = {
    val terms = (1 to k).map(d => math.pow(p, d - 1.0) * (1.0 - p) / d)
    // suffix sums, accumulated from depth k down so w(m) is deterministic
    val w = new Array[Double](k + 1)
    var d = k
    while (d >= 1) { w(d - 1) = w(d) + terms(d - 1); d -= 1 }
    w.take(k).toIndexedSeq
  }

  /** Position discounts 1/log2(i+1) for i = 1..k — public so oracle SQL can
    * embed the identical doubles. */
  def discounts(k: Int): IndexedSeq[Double] =
    (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  /** IDCG@k for binary relevance with k ranked candidates: the in-order
    * left fold of [[discounts]] (order matters for bit-reproducibility). */
  def idcgConst(k: Int): Double = discounts(k).foldLeft(0.0)(_ + _)
}
