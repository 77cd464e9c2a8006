package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed TF-IDF-style term salience — the "what is this document
  * about" primitive behind topic filtering, keyword extraction, and
  * per-domain vocabulary audits of a pretraining corpus.
  *
  * The salience score is `tf * N / df` (term frequency times inverse
  * document frequency without the log): rational arithmetic over exact
  * counts, so two engines rank identically — a log() would reintroduce
  * float-library skew for zero analytical benefit, because log is monotonic
  * and top-k by `tf*N/df` equals top-k by `tf*log(N/df)` only per-tf-tier,
  * while OUR score is itself a legitimate idf weighting (the "raw idf"
  * variant) and is exactly reproducible.
  *
  * Scale shape (100 TB): token explode is a projection (no shuffle); tf is
  * a partial-aggregated groupBy on (doc, term); df partial-aggregates on
  * term — both map-side combine before exchanging; the df side of the join
  * is vocabulary-sized, so AQE broadcasts it in practice; the corpus-wide
  * doc count joins in as a broadcast single row; top-k ranks inside each
  * document only (no global sort). Nothing holds per-corpus state on one
  * node.
  */
object TfIdf {

  /** Top-`k` salient terms per document by `tf * nDocs / df`, ties broken
    * by term. Output: (doc_id, term, tf, df, score), `k` rows per doc
    * (fewer when a doc has fewer distinct terms).
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs.select(
      col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("doc_id", "term", "tf", "df", "score")
  }

  /** Top-`topN` corpus vocabulary by total occurrence count, ties broken by
    * term — driver state the size of the vocabulary (same scale class as a
    * broadcast build side), collected once per corpus. The aggregation
    * partial-combines map-side, so only (term, count) pairs shuffle.
    */
  def vocabulary(docs: DataFrame, textCol: String, topN: Int): Seq[String] =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(topN)
      .collect().map(_.getString(0)).toSeq

  /** Word-familiarity quality score: the fraction of a document's tokens
    * that appear in `vocab` (typically [[vocabulary]]'s top-N list) — the
    * "fraction of words in a common-word list" heuristic that pretraining
    * pipelines use to down-rank gibberish, boilerplate, and non-prose.
    * Rational arithmetic over exact counts (hits / tokens), so the score is
    * reproducible across engines — no log-probability float skew.
    *
    * Scoring is a single codegen'd projection (TokenSetHits hash-set probe
    * per token): zero shuffle, so scoring 100 TB is a map-only pass.
    */
  def familiarity(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String]): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("tok_cnt"),
      TextFunctions.tokenSetHits(col(textCol), vocab).cast("long").as("vocab_hits"))
      .withColumn("familiarity",
        col("vocab_hits").cast("double") / col("tok_cnt"))
}
