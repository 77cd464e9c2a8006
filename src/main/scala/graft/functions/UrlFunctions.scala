package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL and domain filtering for crawl-derived corpora: extract the domains a
  * document links to and drop documents touching blocklisted domains (ad
  * networks, trackers, known-spam TLDs) — a standard admission gate before
  * any text-quality scoring. Pure codegen'd projections/filters: the
  * blocklist folds into the predicate, so over 100 TB this is a map-only
  * scan whose filter pushes like any other.
  *
  * The pattern is restricted to the Java∩RE2 common subset (no lookaround)
  * so a DuckDB oracle replays it verbatim.
  */
object UrlFunctions {

  /** Scheme + host of an http(s) URL; group 1 is the domain. */
  val urlPattern: String = "https?://([A-Za-z0-9.-]+)"

  /** All linked domains, in document order (with duplicates — callers
    * wanting a link profile can `array_distinct`).
    */
  def urlDomains(text: Column): Column =
    regexp_extract_all(text, lit(urlPattern), lit(1))

  /** First linked domain ('' when the document has no URL). */
  def primaryDomain(text: Column): Column = regexp_extract(text, urlPattern, 1)

  /** True when ANY linked domain ends with one of `suffixes` (".net",
    * "ads.example.com", ...). Suffix semantics make one entry cover a whole
    * domain tree, the usual blocklist shape.
    */
  def hasBlockedDomain(text: Column, suffixes: Seq[String]): Column = {
    require(suffixes.nonEmpty, "empty blocklist blocks nothing — pass suffixes")
    exists(urlDomains(text), d => suffixes.map(s => d.endsWith(s)).reduce(_ || _))
  }
}
