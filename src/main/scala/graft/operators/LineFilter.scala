package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-granular cleaning (Raffel et al., "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer", JMLR 2020,
  * §2.2): drop the lines of each document that are too short, lack terminal
  * punctuation, or contain a blocklisted phrase (cookie notices,
  * lorem-ipsum, javascript warnings) — keeping the rest of the document.
  * Line-granular where [[ParagraphDedup]] is occurrence-granular (dedup
  * across documents) and [[SpanDedup]] is token-granular: this one needs no
  * corpus state at all, every rule is local to the line.
  *
  * Scale shape: a single fused projection — split on newline, one
  * higher-order filter whose predicate folds the three rules, rebuild with
  * concat_ws. No shuffle, no UDF, no state; at 100 TB this runs at scan
  * speed. Rules are spelled in engine-portable primitives (literal
  * contains, one anchored character-class regex) so an oracle replays them
  * exactly.
  */
object LineFilter {

  /** Per-line keep rule: at least `minWords` whitespace tokens, ends with
    * terminal punctuation (`.!?"` after right-trim, when required), and
    * contains no phrase of `blockPhrases` (case-insensitive literal match).
    */
  private def keepLine(line: Column, minWords: Int,
      requireTerminalPunct: Boolean, blockPhrases: Seq[String]): Column = {
    val enoughWords = size(split(trim(line), "\\s+")) >= minWords
    val punctOk =
      if (requireTerminalPunct) rtrim(line).rlike("[.!?\"]$") else lit(true)
    val notBlocked = blockPhrases.foldLeft(lit(true)) { (acc, p) =>
      acc && !lower(line).contains(p.toLowerCase)
    }
    enoughWords && punctOk && notBlocked
  }

  /** Rewrite `textCol` keeping only lines passing every rule; every input
    * row survives (possibly emptied — dropping empty documents is the
    * caller's policy), with `n_lines`/`kept_lines` counts for auditing.
    */
  def c4LineFilter(df: DataFrame, textCol: String, minWords: Int = 3,
      requireTerminalPunct: Boolean = true,
      blockPhrases: Seq[String] = Seq("lorem ipsum", "cookie", "javascript"))
      : DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines,
      l => keepLine(l, minWords, requireTerminalPunct, blockPhrases))
    df.withColumn("n_lines", size(lines).cast("long"))
      .withColumn("kept_lines", size(kept).cast("long"))
      .withColumn(textCol, concat_ws("\n", kept))
  }
}
