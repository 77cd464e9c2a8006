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
