package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Per-source corpus datasheet — the one-page report a dataset owner reads
  * before (and after) every pipeline run: volume, token mass, language mix,
  * exact-duplicate exposure, and length-band conformance, per source. This
  * is the "data card" summary of Gebru et al., "Datasheets for Datasets"
  * (CACM'21), restricted to the signals the engine can compute exactly so
  * the whole report is oracle-checkable.
  *
  * Scale shape: two corpus scans — one feeding the per-source aggregate and
  * the (source, lang)-keyed language mode (both map-side-combining
  * aggregates whose output is sources × langs, tiny), and one feeding the
  * corpus-wide fingerprint count join (a 16-byte-key shuffle, the same
  * cost class as exact dedup — which is exactly what dup_doc_rate is). No
  * window over the corpus, no driver-side iteration; every output frame is
  * source-count-sized.
  */
object CorpusCard {

  /** One row per source: n_docs, total_tokens, avg_tokens, n_langs,
    * top_lang (majority language, ties to the lexicographically smallest),
    * dup_doc_rate (fraction of the source's docs whose normalized
    * fingerprint occurs more than once CORPUS-wide — cross-source copies
    * count on both sides), len_ok_rate (fraction inside the [50, 5000]
    * character band, the length rule of the quality filter). All ratios
    * are exact integer sums over exact doubles — engine-order-independent.
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, sourceCol: String): DataFrame = {
    val base = docs.select(
        col(sourceCol).as("source"), col(langCol).as("__lang"),
        when(length(trim(col(textCol))) === 0, lit(0L))
          .otherwise(TextFunctions.tokenCount(col(textCol))).cast("long").as("__toks"),
        length(col(textCol)).between(50, 5000).as("__len_ok"),
        TextFunctions.fingerprint(col(textCol)).as("__fp"))
    val fpCounts = base.groupBy("__fp").agg(count(lit(1)).as("__fpn"))
    val agg = base.join(fpCounts, Seq("__fp"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__toks")).as("total_tokens"),
        (sum(col("__toks")).cast("double") / count(lit(1))).as("avg_tokens"),
        countDistinct(col("__lang")).as("n_langs"),
        (sum(when(col("__fpn") > 1, 1L).otherwise(0L)).cast("double")
          / count(lit(1))).as("dup_doc_rate"),
        (sum(when(col("__len_ok"), 1L).otherwise(0L)).cast("double")
          / count(lit(1))).as("len_ok_rate"))
    val langRank = Window.partitionBy("source")
      .orderBy(desc("__langN"), asc("__lang"))
    val topLang = base.groupBy("source", "__lang")
      .agg(count(lit(1)).as("__langN"))
      .withColumn("__rn", row_number().over(langRank))
      .filter(col("__rn") === 1)
      .select(col("source"), col("__lang").as("top_lang"))
    agg.join(topLang, Seq("source"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("avg_tokens"), col("n_langs"), col("top_lang"),
        col("dup_doc_rate"), col("len_ok_rate"))
  }
}
