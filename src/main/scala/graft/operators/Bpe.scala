package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer TRAINING and encoding (Sennrich et al.,
  * ACL'16) — the real merge-learning algorithm, not a token-count proxy
  * (q67's `bpeTokenCount` estimates costs; this learns an actual merge
  * table and emits actual subwords).
  *
  * Scale split, exactly as production tokenizer trainers do it
  * (sentencepiece/HF train on a word-frequency table, not the raw
  * corpus): the corpus-sized work — word counting — is one distributed
  * map-side-combined pass; merge learning then runs on the vocabulary-
  * bounded (word, count) table on the driver, and the learned table rides
  * into a zero-shuffle [[graft.expressions.BpeEncode]] kernel that
  * encodes 100 TB map-only.
  *
  * Conventions (all deterministic): pair counting weighs EVERY adjacent
  * symbol pair by word frequency (overlaps included); ties on count break
  * to the lexicographically smallest pair; merging rewrites occurrences
  * left-to-right, non-overlapping.
  */
object Bpe {

  /** Learned merge table, rank = learning order. */
  final case class Model(merges: Seq[(String, String)]) {
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** Distributed (word, cnt) table — the only corpus-sized step. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.hashAlignedTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Classic BPE training over a collected word-frequency table. */
  def train(counts: Seq[(String, Long)], numMerges: Int): Model = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words: Seq[(Vector[String], Long)] =
      counts.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val pairCnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCnt.update(p, pairCnt.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCnt.isEmpty) done = true
      else {
        val best = pairCnt.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergePair(syms, best), c) }
        m += 1
      }
    }
    Model(merges.result())
  }

  /** Left-to-right non-overlapping rewrite of one pair. */
  private[operators] def mergePair(syms: Vector[String],
      pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Train end-to-end: distributed counts → driver merge learning. */
  def trainOn(docs: DataFrame, textCol: String, numMerges: Int): Model =
    train(wordCounts(docs, textCol).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq, numMerges)

  /** Encode: per document, whitespace words each rewritten by the merge
    * table (lowest-rank pair first, all its occurrences, repeat), subwords
    * concatenated in document order. One zero-shuffle projection.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    docs.select(col(idCol),
      ColumnBridge.column(graft.expressions.BpeEncode(
        ColumnBridge.expression(col(textCol)), model.merges))
        .as("subwords"))
}
