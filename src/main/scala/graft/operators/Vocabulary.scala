package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Tokenizer-vocabulary construction and corpus re-encoding: assign every
  * distinct term a stable integer id (1-based, ranked by frequency desc then
  * term — the order is total, so ids are reproducible across runs, engines
  * and partitionings), then rewrite documents as id sequences. This is the
  * "build the vocab, encode the corpus" preprocessing step before training.
  *
  * Scale design: term counting is one explode + map-side-combined groupBy
  * (the shuffle carries the VOCABULARY, not the token stream); id assignment
  * ranks the vocabulary with [[Curriculum.withGlobalRank]]'s distributed
  * prefix sum — vocabularies are Zipf-shaped and can reach hundreds of
  * millions of n-gram entries, so no single-partition window. Encoding joins
  * per-occurrence tokens to the dictionary on the term — Spark broadcasts
  * small dictionaries automatically and shuffle-joins big ones; either way
  * the corpus streams through once.
  */
object Vocabulary {

  /** The dictionary: one row per distinct whitespace token of `textCol`,
    * with corpus frequency `freq` and stable id `vid` (1 = most frequent;
    * ties broken by term order).
    */
  def dictionary(df: DataFrame, textCol: String): DataFrame = {
    val tf = df.select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
    Curriculum.withGlobalRank(tf.withColumn("__neg", -col("freq")),
      Seq("__neg", "term"))
      .select(col("term"), col("freq"), col("rank").as("vid"))
  }

  /** Coverage-pruned vocabulary: the SMALLEST frequency-ranked prefix of
    * [[dictionary]] whose terms cover at least `coverage` (0..1] of the
    * corpus token mass — "the vocab that explains 99.5% of tokens", the
    * standard size/coverage trade a tokenizer owner makes before freezing
    * (everything outside maps to OOV, whose rate q166 then audits).
    * A term is kept iff the token mass BELOW its rank is still short of
    * the target — exactly the minimal covering prefix, with no
    * tie-ambiguity because the rank order is total (freq desc, term).
    *
    * Output: (term, freq, vid, cum_tokens, cum_frac) for kept terms —
    * `cum_tokens` the inclusive running mass in rank order, `cum_frac`
    * its fraction of the corpus total.
    *
    * Scale shape: the cumulative mass is [[Packing.withGlobalOffsets]]'s
    * two-phase sharded prefix sum over the vid order (a vocabulary can be
    * hundreds of millions of n-grams — no single-partition window); the
    * corpus total rides in as a broadcast single-row frame and the cut is
    * then a stateless filter.
    */
  def coveragePrune(df: DataFrame, textCol: String,
      coverage: Double): DataFrame = {
    require(coverage > 0 && coverage <= 1.0,
      s"coverage must be in (0, 1], got $coverage")
    val dict = dictionary(df, textCol)
    val withCum = Packing.withGlobalOffsets(dict, Seq("vid"), "freq")
    // total over the frame withGlobalOffsets already persisted — summing
    // `dict` directly would rebuild the whole tokenize+count aggregate a
    // second time just for one scalar
    val total = withCum.agg(sum(col("freq")).as("__total"))
    withCum.crossJoin(broadcast(total))
      .filter(col("offset").cast("double") <
        lit(coverage) * col("__total").cast("double"))
      .select(col("term"), col("freq"), col("vid"),
        (col("offset") + col("freq")).as("cum_tokens"),
        ((col("offset") + col("freq")).cast("double")
          / col("__total").cast("double")).as("cum_frac"))
  }

  /** Per-occurrence encoding: (id, pos, term, vid) for every token of every
    * document, `pos` 1-based in document order; tokens absent from the
    * dictionary (possible when encoding NEW data with a frozen vocab) get
    * vid = 0 (the OOV id).
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      dictionary: DataFrame): DataFrame =
    df.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__p", "term")))
      .withColumn("pos", col("__p").cast("long") + 1L)
      .join(dictionary.select("term", "vid"), Seq("term"), "left")
      .select(col(idCol), col("pos"), col("term"),
        coalesce(col("vid"), lit(0L)).as("vid"))
}
