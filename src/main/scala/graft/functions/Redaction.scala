package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: replace email
  * addresses, phone numbers and IPv4 addresses with typed placeholders and
  * count what was removed. A corpus release step runs this over every
  * document, so it must stay a pure codegen'd projection — regexp_replace /
  * regexp_count over 100 TB is a map-only scan with zero shuffle.
  *
  * The patterns are deliberately restricted to syntax Java regex and RE2
  * evaluate identically (no lookaround, no backreferences, ASCII classes
  * only) so a DuckDB oracle can replay them verbatim; this also keeps them
  * linear-time under RE2 semantics.
  */
object Redaction {

  /** user@host.tld with the common local-part characters. */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-prefix phone shape +CC-NNN-NNNN (dashed groups). */
  val phonePattern: String = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}"

  /** Dotted-quad IPv4 (syntactic — does not range-check octets). */
  val ipPattern: String = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Count of each PII category present in `text`. */
  def emailCount(text: Column): Column = regexp_count(text, lit(emailPattern)).cast("long")
  def phoneCount(text: Column): Column = regexp_count(text, lit(phonePattern)).cast("long")
  def ipCount(text: Column): Column = regexp_count(text, lit(ipPattern)).cast("long")

  /** Replace every email/phone/IP with a typed placeholder. Emails first —
    * an email's domain could otherwise be clipped by the IP pattern when it
    * contains dotted digit runs; phones before IPs for the same reason
    * (dashed digit groups never contain dots, but the reverse order would
    * let the IP pattern eat nothing it shouldn't — the order is still fixed
    * so the output is well-defined when categories overlap).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        phonePattern, "<PHONE>"),
      ipPattern, "<IP>")

  /** Per-group PII density profile — the release-review report over a
    * corpus slice (per source/domain/language): document volume, total
    * hits per category, how many documents carry ANY hit, and that
    * fraction. The number a release gate thresholds ("block the source if
    * >1% of its documents leak emails"), upstream of [[redactPii]] which
    * then scrubs what ships. One map-side-combining aggregate; the three
    * counts ride the same scan-level projection as the redaction itself.
    */
  def piiProfile(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
      text: Column): org.apache.spark.sql.DataFrame = {
    val hits = emailCount(text) + phoneCount(text) + ipCount(text)
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(emailCount(text)).as("n_emails"),
        sum(phoneCount(text)).as("n_phones"),
        sum(ipCount(text)).as("n_ips"),
        sum(when(hits > 0, 1L).otherwise(0L)).as("docs_with_pii"))
      .withColumn("pii_rate",
        col("docs_with_pii").cast("double") / col("n_docs"))
  }
}
