package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Multi-pattern blocklist probing over a text corpus in ONE pass — the
  * scale-correct form of "does this document mention any of these K
  * terms": a single [[graft.expressions.MultiPatternScan]] Aho–Corasick
  * walk per document instead of K `contains`/`rlike` scans, so cost is
  * O(bytes + matches) regardless of blocklist size and the corpus is
  * read once. Zero shuffle; the automaton is driver-built model state.
  *
  * Counting contract: `n_hits` counts every occurrence (one per match end
  * position, overlaps included), `n_terms` counts distinct patterns that
  * matched at least once — both exactly replayable by a position-scan
  * oracle.
  */
object BlocklistScan {

  /** (idCol, n_hits, n_terms) per document; substring semantics. */
  def scan(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame =
    df.select(col(idCol),
        ColumnBridge.column(graft.expressions.MultiPatternScan(
          ColumnBridge.expression(col(textCol)), patterns)).as("__s"))
      .select(col(idCol),
        col("__s")(0).as("n_hits"),
        col("__s")(1).as("n_terms"))
}
