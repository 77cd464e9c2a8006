package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Tokenizer fertility audit — the per-slice "how many subwords does a
  * word cost here" table read when choosing or validating a tokenizer
  * against a multi-source, multi-lingual corpus (fertility ≫ 1 on a
  * language means its text burns sequence length; a source whose
  * bytes-per-subword collapses signals binary/mojibake contamination).
  * Same role as the fertility tables in multilingual-tokenizer papers
  * (e.g. Rust et al., ACL'21 "How Good is Your Tokenizer?"), computed
  * corpus-wide instead of on a sample.
  *
  * The subword proxy is the BPE-ish segmentation used across this repo
  * (alphanumeric runs + individual non-space punctuation) expressed as
  * two regexp counts — NOT [[TextFunctions.subwordCount]]'s lookaround
  * split, which RE2-based engines cannot replay; the two agree except
  * that control characters other than the kernel whitespace set are
  * counted as punctuation here. Word counts go through the hash-aligned
  * kernel tokenizer, so fertility here divides the same word count every
  * other token-accounting op charges.
  *
  * Scale shape: one projection + one map-side-combining groupBy at
  * slice cardinality; ratios are divisions of exact integer sums, so the
  * report is bit-deterministic on any partitioning.
  */
object TokenizerAudit {

  /** Subwords as two codegen regexp counts: alphanumeric runs, plus every
    * non-alphanumeric char that is not kernel whitespace.
    */
  def subwordProxyCount(text: Column): Column =
    (size(regexp_extract_all(text, lit("[A-Za-z0-9]+"), lit(0))) +
      size(regexp_extract_all(text, lit("[^A-Za-z0-9 \t\n\r]"), lit(0))))
      .cast("long")

  /** Per-group fertility rows: (groupCols..., n_docs, words, subwords,
    * bytes, fertility = subwords/words, bytes_per_subword). Groups whose
    * text carries no words/subwords report NULL ratios rather than a
    * division error.
    */
  def fertility(docs: DataFrame, groupCols: Seq[String],
      textCol: String): DataFrame =
    docs
      .select(groupCols.map(col) ++ Seq(
        TextFunctions.hashAlignedTokenCount(col(textCol)).cast("long")
          .as("__w"),
        subwordProxyCount(col(textCol)).as("__s"),
        octet_length(col(textCol)).cast("long").as("__b")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).as("words"),
        sum(col("__s")).as("subwords"),
        sum(col("__b")).as("bytes"))
      .withColumn("fertility",
        col("subwords").cast("double") / nullif(col("words"), lit(0L)).cast("double"))
      .withColumn("bytes_per_subword",
        col("bytes").cast("double") / nullif(col("subwords"), lit(0L)).cast("double"))
}
