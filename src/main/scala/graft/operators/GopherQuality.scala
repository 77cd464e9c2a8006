package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Gopher-style document quality rules (Rae et al., "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher",
  * arXiv:2112.11446 §A1.1) — the classic rule battery a web corpus passes
  * through before any learned filter: word-count bounds, mean-word-length
  * sanity, symbol-to-word ratio (hash marks and ellipses), the fraction of
  * words containing an alphabetic character, and minimum stopword
  * presence. Complements [[graft.functions.TextFunctions.qualityScore]]
  * (a compact composite) with the per-rule breakdown a corpus owner tunes:
  * each component is its own column, `pass` is their conjunction, so the
  * report doubles as a filter ([[filterPassing]]) and a diagnosis (which
  * rule fired).
  *
  * Reference scope: generalizes the declarative per-row rule battery of
  * dbt/models/sources.yml:12-45 (accepted-values/not-null checks on
  * insurance rows) to the document-quality rules of an LLM pipeline.
  *
  * Scale shape: one fused codegen projection per document — no UDFs, no
  * shuffle, no state; the `pass` predicate pushes into the scan like any
  * other filter. All arithmetic is integer counts plus one IEEE division
  * per ratio, so an oracle replays it bit-for-bit.
  */
object GopherQuality {

  final case class Thresholds(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2)

  /** Occurrences of a literal (non-overlapping, leftmost-first — the
    * semantics both Spark's regexp_replace and an oracle's replace share).
    */
  private def literalCount(text: Column, lit0: String, escaped: String): Column =
    (length(text) - length(regexp_replace(text, escaped, ""))) / lit0.length

  /** The metric and per-rule columns, in report order. One definition so
    * [[report]] and [[filterPassing]] can never diverge.
    */
  private def components(textCol: String, stopwords: Seq[String],
      t: Thresholds): Seq[(String, Column)] = {
    val text = col(textCol)
    val toks = TextFunctions.tokens(text)
    val nWords = TextFunctions.tokenCount(text)
    val meanLen = TextFunctions.avgWordLen(text)
    val symbols = literalCount(text, "#", "#") + literalCount(text, "...", "\\.\\.\\.")
    val symbolRatio = symbols.cast("double") / nWords
    val alphaWords = size(filter(toks, w => w.rlike("[A-Za-z]")))
    val alphaFrac = alphaWords.cast("double") / nWords
    val stopHits = TextFunctions.tokenSetHits(text, stopwords)
    val okWords = nWords.between(t.minWords, t.maxWords)
    val okMeanLen = meanLen.between(t.minMeanWordLen, t.maxMeanWordLen)
    val okSymbols = symbolRatio <= t.maxSymbolRatio
    val okAlpha = alphaFrac >= t.minAlphaFrac
    val okStops = stopHits >= t.minStopHits
    Seq(
      "n_words" -> nWords.cast("long"),
      "mean_word_len" -> meanLen,
      "symbol_ratio" -> symbolRatio,
      "alpha_frac" -> alphaFrac,
      "stop_hits" -> stopHits.cast("long"),
      "ok_words" -> okWords,
      "ok_mean_len" -> okMeanLen,
      "ok_symbols" -> okSymbols,
      "ok_alpha" -> okAlpha,
      "ok_stops" -> okStops,
      "pass" -> (okWords && okMeanLen && okSymbols && okAlpha && okStops))
  }

  /** Per-document rule report: metric columns, one boolean per rule, and
    * the conjunction `pass`. Empty/whitespace-only documents fail the
    * word-count rule; their NULL-free zero counts keep every ratio finite
    * except mean_word_len's 0/1 artifact, which the word-count rule already
    * rejects.
    */
  def report(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], t: Thresholds = Thresholds()): DataFrame =
    df.select(col(idCol) +: components(textCol, stopwords, t)
      .map { case (name, c) => c.as(name) }: _*)

  /** The rows of `df` whose rules all pass — a pure map-side filter (the
    * predicate folds into the scan; no join back to the report).
    */
  def filterPassing(df: DataFrame, textCol: String, stopwords: Seq[String],
      t: Thresholds = Thresholds()): DataFrame =
    df.filter(components(textCol, stopwords, t).last._2)
}
