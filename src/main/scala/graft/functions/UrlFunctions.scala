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

  /** Canonical form of a single http(s) URL — the identity under which
    * crawl URLs deduplicate. The same page arrives as `HTTP://Ex.com:80/a/`,
    * `http://ex.com/a?utm_source=x` and `http://ex.com/a`; URL-level dedup
    * (the crawl frontier's first dedup tier, before any content hashing)
    * only works if all three collapse. Normalizations, in order:
    * scheme+host lowercased (path/query stay case-sensitive per RFC 3986),
    * default port dropped (:80 http, :443 https), fragment dropped,
    * tracking parameters removed (utm_*, gclid, fbclid — delimiter-anchored,
    * so "?sgclid=…" and path text never match), separators re-collapsed,
    * and trailing path slashes normalized ("/a/" = "/a", "/a/?x" = "/a?x";
    * a "/" ending a query value is preserved).
    *
    * Pure codegen'd string kernel — regexes are Java∩RE2 (no lookaround),
    * applied in a fixed order an oracle replays verbatim; at 100 TB this is
    * a map-only projection feeding an exact groupBy dedup.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val host = lower(regexp_extract(url, "^[A-Za-z]+://([A-Za-z0-9.-]+(:[0-9]+)?)", 1))
    val rest = regexp_replace(url, "^[A-Za-z]+://[A-Za-z0-9.-]+(:[0-9]+)?", "")
    val hostNoPort = when(scheme === "http", regexp_replace(host, ":80$", ""))
      .when(scheme === "https", regexp_replace(host, ":443$", ""))
      .otherwise(host)
    val noFragment = regexp_replace(rest, "#.*", "")
    // tracking params must be DELIMITER-anchored ([?&], kept via capture):
    // an unanchored pattern substring-matches inside other parameter names
    // ("?sgclid=…") and even path segments, corrupting distinct URLs into
    // false dedup merges
    val noTracking = regexp_replace(noFragment,
      "([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*", "$1")
    val collapsed = regexp_replace(
      regexp_replace(regexp_replace(noTracking, "&+", "&"), "\\?&", "?"),
      "[?&]+$", "")
    // trailing-slash normalization: slashes right before the FIRST '?'
    // fold into it ("/a/?x" → "/a?x"); with no query, trailing slashes
    // drop for ANY path ("/a/" → "/a", bare "/" → ""). BOTH rules anchor
    // through ^[^?]* so they only ever touch the path component — a '/'
    // or '/?' inside a query VALUE (e.g. "?next=/foo/?page=2", common in
    // redirect params) is never rewritten
    val noSlash = regexp_replace(
      regexp_replace(collapsed, "^([^?]*?)/+\\?", "$1?"), "^([^?]*)/+$", "$1")
    concat(scheme, lit("://"), hostNoPort, noSlash)
  }
}
