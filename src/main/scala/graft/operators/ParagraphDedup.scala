package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Paragraph-granular deduplication — the CCNet preprocessing step (Wenzek
  * et al., "CCNet: Extracting High Quality Monolingual Datasets from Web
  * Crawl Data", LREC'20 §3: web pages are deduplicated *per paragraph*, not
  * per page, because the page-level signal is swamped by boilerplate).
  * Sits between the document-granular ops ([[TextDedup]]) and the
  * token-window ops ([[SpanDedup]]): the unit of identity is a separator-
  * delimited block, which is how navigation chrome, headers, footers and
  * legal notices actually repeat across a crawl. Reference scope: extends
  * the row-dedup contract of tests/unit/test_ingestion.py:131-156 to
  * intra-document blocks.
  *
  * Scale design: one posexplode projection (map-only — no shuffle until the
  * aggregate), a map-side-combining groupBy on the paragraph's xxhash64 for
  * canonical selection / document frequency, and a SpanDedup-style rebuild:
  * only the *dropped positions* per document travel back (a left join the
  * optimizer can broadcast when duplication is sparse), and the text is
  * rebuilt with a codegen higher-order filter over the split array — the
  * corpus itself is never re-shuffled. Hashing is 64-bit: at 10^12
  * paragraphs the collision expectation is ~0.03 per corpus, and a
  * collision costs one wrongly-dropped paragraph, not a wrong join.
  */
object ParagraphDedup {

  /** `sep` is a LITERAL separator (quoted before the regex split), so the
    * same string both splits and re-joins — a regex separator could not be
    * re-joined losslessly.
    */
  private def splitParas(text: Column, sep: String): Column =
    split(text, java.util.regex.Pattern.quote(sep))

  /** (idCol, pos, para, h) — one row per non-empty paragraph. Positions
    * index the RAW split (empties keep their slot) so the rebuild's
    * higher-order filter addresses the same array; empty paragraphs carry
    * no content and never participate in identity.
    */
  def paragraphs(df: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame =
    df.select(col(idCol), posexplode(splitParas(col(textCol), sep)))
      .toDF(idCol, "pos", "para")
      .filter(col("para") =!= "")
      .withColumn("h", xxhash64(col("para")))

  /** Paragraph doc-frequency report: (para, n_docs, first_doc) for every
    * paragraph occurring in at least `minDocFreq` distinct documents — the
    * boilerplate audit a corpus owner reads before choosing a strip
    * threshold (the repeated header is visible here long before it skews
    * an LM). Carries the paragraph text out of the aggregate (min — all
    * occurrences of a hash share it, and min is deterministic where first
    * is partition-order-dependent), so the report is human-readable
    * without a second corpus pass.
    */
  def boilerplateReport(df: DataFrame, idCol: String, textCol: String,
      sep: String, minDocFreq: Int): DataFrame =
    paragraphs(df, idCol, textCol, sep)
      .groupBy("h")
      .agg(min(col("para")).as("para"),
        countDistinct(col(idCol)).as("n_docs"),
        min(col(idCol)).as("first_doc"))
      .filter(col("n_docs") >= minDocFreq)
      .select("para", "n_docs", "first_doc")

  /** Corpus with duplicate paragraphs removed, keeping exactly one copy —
    * the occurrence at the lexicographically-smallest (document id,
    * position). Every input row survives with `textCol` rebuilt from its
    * kept paragraphs (separator-joined, empties collapsed) plus a
    * `kept_paras` count; a document reduced to nothing comes back empty
    * rather than disappearing — dropping it is the caller's policy.
    *
    * With `minDocFreq > 2` the keep-one rule applies only to paragraphs
    * reaching that document frequency and rarer duplicates are left alone
    * (boilerplate-only stripping); `dropAll = true` removes boilerplate
    * copies entirely, first occurrence included — CCNet's mode for chrome
    * that should not survive even once.
    */
  def dropDuplicateParagraphs(df: DataFrame, idCol: String, textCol: String,
      sep: String, minDocFreq: Int = 2, dropAll: Boolean = false): DataFrame = {
    val paras = paragraphs(df, idCol, textCol, sep)
    // canonical occurrence per hash: min (doc, pos) struct — one map-side
    // combining aggregate over (hash → tiny struct), distinct-paragraph
    // sized, never carrying paragraph text
    val canon = paras.groupBy("h")
      .agg(countDistinct(col(idCol)).as("__df"),
        min(struct(col(idCol).as("__d"), col("pos").as("__p"))).as("__first"))
      .filter(col("__df") >= minDocFreq)
    // canon grows with the corpus (duplicated-paragraph-sized): shuffle,
    // never broadcast (the post-explode underestimate trap, SCALING.md r8)
    val dropped = paras.join(canon.hint("shuffle_hash"), Seq("h"))
      .filter(if (dropAll) lit(true)
        else col(idCol) =!= col("__first.__d") || col("pos") =!= col("__first.__p"))
      .select(col(idCol), col("pos"))
    rebuildWithoutPositions(df, idCol, textCol, sep, dropped)
  }

  /** Rebuild `textCol` excluding the paragraph `pos`itions in `dropped`:
    * per-document dropped-position arrays (few — only duplicate
    * occurrences) left-join the corpus and a codegen higher-order filter
    * keeps the rest, so the corpus is scanned once and shuffled never.
    * Empty paragraphs (consecutive separators) are collapsed — they carry
    * no content and re-splitting the rebuilt text must be stable.
    */
  private def rebuildWithoutPositions(df: DataFrame, idCol: String,
      textCol: String, sep: String, dropped: DataFrame): DataFrame = {
    val dropArrs = dropped.groupBy(idCol)
      .agg(collect_list(col("pos")).as("__drop"))
    val drops = coalesce(col("__drop"), array().cast("array<int>"))
    df.join(dropArrs.hint("shuffle_hash"), Seq(idCol), "left")
      .withColumn("__kept",
        filter(splitParas(col(textCol), sep), (p: Column, i: Column) =>
          p =!= "" && !array_contains(drops, i)))
      .withColumn(textCol, concat_ws(sep, col("__kept")))
      .withColumn("kept_paras", size(col("__kept")).cast("long"))
      .drop("__drop", "__kept")
  }
}
