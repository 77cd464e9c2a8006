package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.TextFunctions

/** DSIR-style data selection — hashed n-gram importance weighting (Xie et
  * al., NeurIPS'23, "Data Selection for Language Models via Importance
  * Resampling"): estimate bucketed n-gram distributions for a TARGET
  * corpus (the domain you want more of) and the RAW corpus, weight each
  * bucket by its log probability ratio, score every raw document by the
  * sum of its features' weights, and keep the top of the importance
  * ranking. The method the current generation of pretraining pipelines
  * uses to tilt a web-scale corpus toward a quality/domain target without
  * training a model first.
  *
  * Scale shape: training is two explode + map-side-combined groupBys over
  * at most `numBuckets` keys (the collect is `numBuckets` rows — driver
  * state by contract, like k-means centroids); scoring is ONE corpus scan,
  * zero shuffle — the weight table rides inside a codegen kernel
  * ([[graft.expressions.ArrayWeightSum]]). Selection is orderBy+limit
  * (TakeOrderedAndProject: per-partition top-k, never a global sort spill).
  *
  * Feature hashing draws from each n-gram's md5 (the
  * [[Sampling.hashBucket]] 32-bit draw), NOT a faster rolling hash: md5 is
  * reproducible across runs, engines and languages, so scores can be
  * audited off-cluster and replayed in the DuckDB oracle. Featurization is
  * fused into the one-pass [[graft.expressions.HashedNgramBuckets]] kernel
  * (digest over token bytes — no n-gram string ever materializes), map-only
  * and linear.
  */
object Dsir {

  /** Word n-gram feature strings of a document in POSITION ORDER: for each
    * n in 1..maxN ascending, the n-grams of the kernel-aligned token stream
    * ([[TextFunctions.hashAlignedTokens]] — space/tab/CR/LF delimiters,
    * empty artifacts dropped), n-grams joined with a single space.
    * Unigrams first, then bigrams, etc. — the order the scoring fold and
    * the oracle's positional replay both follow. Documents with fewer than
    * n tokens contribute no n-grams at that order; empty/whitespace-only
    * text yields an empty array.
    */
  def ngramFeatures(text: Column, maxN: Int): Column = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val t = TextFunctions.hashAlignedTokens(text)
    val per = (1 to maxN).map { n =>
      if (n == 1) t else TextFunctions.shinglesOfTokens(t, n)
    }
    if (per.length == 1) per.head else concat(per: _*)
  }

  /** Stable feature bucket in [0, numBuckets): first 32 bits of the
    * feature string's md5, mod numBuckets — the same widened draw as
    * [[Sampling.hashBucket]] (16 bits mod 10k buckets would skew most
    * admission thresholds by ~7%; 32 bits bias ~2e-6).
    */
  def featureBucket(feature: Column, numBuckets: Int): Column =
    conv(substring(md5(feature.cast("binary")), 1, 8), 16, 10)
      .cast("long") % numBuckets

  /** The document's feature-bucket array in one pass — bitwise
    * `transform(ngramFeatures(text, maxN), f => featureBucket(f,
    * numBuckets))`, through the [[graft.expressions.HashedNgramBuckets]]
    * kernel instead of interpreted HOF lambdas that materialize every
    * n-gram string (~10× on corpus scans; DsirSpec pins the equivalence).
    */
  def featureBuckets(text: Column, maxN: Int, numBuckets: Int): Column =
    ColumnBridge.column(graft.expressions.HashedNgramBuckets(
      ColumnBridge.expression(text), maxN, numBuckets))

  /** Per-bucket feature counts of a corpus plus the total feature count —
    * driver state (`numBuckets` longs). One explode + one groupBy over at
    * most `numBuckets` keys (map-side combine does nearly all the work at
    * corpus scale).
    */
  def bucketCounts(docs: DataFrame, textCol: String, maxN: Int,
      numBuckets: Int): (Array[Long], Long) = {
    val rows = docs
      .select(explode(featureBuckets(col(textCol), maxN, numBuckets)).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("c"))
      .collect()
    val counts = new Array[Long](numBuckets)
    rows.foreach(r => counts(r.getLong(0).toInt) = r.getLong(1))
    (counts, counts.sum)
  }

  /** Per-bucket log importance ratios
    * `ln(p_target(b)) - ln(p_raw(b))` under additive smoothing
    * `p(b) = (count(b) + alpha) / (total + alpha * numBuckets)`, computed
    * on the DRIVER with `Math.log` — bitwise-equal to DuckDB `ln` (Spark's
    * distributed `log` is StrictMath-backed and may differ in the last
    * ulp), which is what makes downstream scores oracle-exact.
    */
  def trainWeights(target: DataFrame, raw: DataFrame, textCol: String,
      maxN: Int, numBuckets: Int, alpha: Double = 0.5): Array[Double] = {
    val (tc, tTot) = bucketCounts(target, textCol, maxN, numBuckets)
    val (rc, rTot) = bucketCounts(raw, textCol, maxN, numBuckets)
    weightsFrom(tc, tTot, rc, rTot, alpha, numBuckets)
  }

  /** The smoothed ln-ratio table both trainers share — ONE definition so
    * the one-pass and two-pass paths cannot drift (and the DuckDB-parity
    * arithmetic — driver `Math.log`, alpha placement — lives in one place).
    */
  private def weightsFrom(tc: Array[Long], tTot: Long, rc: Array[Long],
      rTot: Long, alpha: Double, numBuckets: Int): Array[Double] =
    Array.tabulate(numBuckets) { b =>
      math.log((tc(b) + alpha) / (tTot + alpha * numBuckets)) -
        math.log((rc(b) + alpha) / (rTot + alpha * numBuckets))
    }

  /** [[trainWeights]] for the common case where the target is a SUBSET of
    * the raw corpus (a labeled/high-quality slice): identical weights from
    * ONE corpus pass instead of two — each bucket tallies its total count
    * and its target-flagged count in the same aggregation. DsirSpec pins
    * the equality with `trainWeights(raw.filter(cond), raw, ...)`.
    */
  def trainWeightsSubset(raw: DataFrame, targetCond: Column, textCol: String,
      maxN: Int, numBuckets: Int, alpha: Double = 0.5): Array[Double] = {
    val rows = raw
      .select(targetCond.as("__t"),
        explode(featureBuckets(col(textCol), maxN, numBuckets)).as("__b"))
      .groupBy("__b")
      .agg(count(lit(1)).as("c"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("ct"))
      .collect()
    val rc = new Array[Long](numBuckets)
    val tc = new Array[Long](numBuckets)
    rows.foreach { r =>
      rc(r.getLong(0).toInt) = r.getLong(1)
      tc(r.getLong(0).toInt) = r.getLong(2)
    }
    weightsFrom(tc, tc.sum, rc, rc.sum, alpha, numBuckets)
  }

  /** Importance score per document: `(idCol, n_features, dsir_logw)` where
    * `dsir_logw` is the sum of the document's feature-bucket weights in
    * feature order (the log importance weight of the document under the
    * product-of-features model). Zero shuffle — one projection pass; the
    * weight table lives inside the kernel. `n_features` derives from the
    * one-pass token count (`sum over n of max(tokens - n + 1, 0)`) rather
    * than re-evaluating the feature construction. Documents with no
    * features (empty/whitespace-only) are unscorable and dropped — the
    * same contract as [[UnigramLm.scoreBroadcast]].
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], maxN: Int): DataFrame =
    // unscorable docs are dropped by the CHEAP count kernel (pushes to the
    // scan as a data filter — one byte pass, no digest); the digest kernel
    // is then projected as an attribute whose length IS n_features, so
    // each surviving document is digested exactly once. Filtering on
    // size(__buckets) instead would push `size(kernel(text)) > 0` below
    // the projection and digest every document twice; the plan guard
    // asserts the single evaluation.
    docs.filter(TextFunctions.hashAlignedTokenCount(col(textCol)) > 0)
      .select(col(idCol),
        featureBuckets(col(textCol), maxN, weights.length).as("__buckets"))
      .select(col(idCol),
        size(col("__buckets")).cast("long").as("n_features"),
        ColumnBridge.column(graft.expressions.ArrayWeightSum(
          ColumnBridge.expression(col("__buckets")), weights.toSeq))
          .as("dsir_logw"))

  /** Greedy selection: the k highest-scoring documents, ties broken by the
    * smaller id. Deterministic and oracle-exact (scores are bitwise
    * reproducible); plans as TakeOrderedAndProject — per-partition top-k
    * heaps + one tiny driver merge, no global sort at any corpus size.
    */
  def selectTopK(scored: DataFrame, idCol: String, k: Int,
      scoreCol: String = "dsir_logw"): DataFrame =
    scored.orderBy(col(scoreCol).desc, col(idCol).asc).limit(k)

  /** Faithful DSIR selection — Gumbel-top-k resampling: add i.i.d. Gumbel
    * noise `g = -ln(-ln(u))` to each log weight and take the k largest
    * keys, which samples k documents WITHOUT replacement with probability
    * proportional to their importance weights (the Gumbel-max trick).
    * `u` is a deterministic uniform from the doc key's md5 (the
    * [[Sampling]] discipline: same seed + same corpus = same sample, on
    * any partitioning — no RNG state to ship). Spec-tested rather than
    * oracle-gated: the per-row `-ln(-ln(u))` goes through Spark's
    * StrictMath-backed `log`, which is not guaranteed bitwise-equal to
    * DuckDB's `ln` at selection boundaries; [[selectTopK]] is the
    * oracle-exact path.
    */
  def resampleGumbel(scored: DataFrame, idCol: String, k: Int, seed: String,
      scoreCol: String = "dsir_logw"): DataFrame = {
    val u = (conv(substring(md5(concat(lit(seed),
        col(idCol).cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    scored.withColumn("__gumbel_key", col(scoreCol) - log(-log(u)))
      .orderBy(col("__gumbel_key").desc, col(idCol).asc)
      .limit(k)
      .drop("__gumbel_key")
  }
}
