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
}
