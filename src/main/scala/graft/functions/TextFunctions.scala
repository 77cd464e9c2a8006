package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale document pipelines:
  * tokenization, counting, stopword/quality scoring, language-ID heuristics,
  * normalization and fingerprinting.
  *
  * Everything here is a pure `Column` expression built from
  * `org.apache.spark.sql.functions` — whole-stage-codegen friendly, no UDFs,
  * so a scan over 100 TB of documents stays a single fused projection.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Tokens POSITIONALLY ALIGNED with the one-pass hashing kernel
    * (graft.expressions.TextHashing): delimiters are runs of
    * space/\t/\n/\r only, empty artifacts removed, so element i here IS
    * the token whose hash sits at window position i in ShingleHashes.
    * [[tokens]] is NOT that: `trim` strips only spaces (a leading \t/\n
    * leaves an empty first element, shifting every position by one) and
    * `\s` also breaks on \f/\x0B, which the kernel treats as token bytes.
    * Any operator that maps kernel positions back onto text (span strip,
    * CMS verify, LM token counts) must tokenize through here.
    */
  def hashAlignedTokens(text: Column): Column =
    filter(split(text, "[ \t\n\r]+"), t => t =!= "")

  /** Count of [[hashAlignedTokens]] — the token count the hashing kernel
    * actually sees (0 for empty/whitespace-only text, where [[tokenCount]]
    * counts the split artifact as 1). One-pass codegen expression
    * (graft.expressions.AlignedTokenCount), not size-of-filtered-split:
    * this count rides next to the scoring kernels on full corpus scans.
    */
  def hashAlignedTokenCount(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.AlignedTokenCount(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** A BPE-ish subword proxy: alphanumeric runs + individual punctuation,
    * approximating how byte-pair tokenizers split mixed text.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"), t => t =!= " " && t =!= ""))

  /** GPT-2-style pretokenization pattern, simplified for cross-engine
    * reproducibility: contraction suffixes, space-prefixed letter runs,
    * space-prefixed digit runs, space-prefixed punctuation runs, whitespace
    * runs — leftmost-first alternation, which Java regex and RE2 evaluate
    * identically. Deliberately avoids the original's lookahead
    * (`\s+(?!\S)`) and `\p{L}` classes (RE2/Java unicode-class skew), and
    * spells the whitespace class out because Java's `\s` includes vertical
    * tab while RE2's does not.
    */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\r\\f]+"

  /** BPE-ish token count: number of [[bpePattern]] pretokens — the standard
    * proxy for "how many tokens will the tokenizer emit", used to cost and
    * bucket documents before real BPE runs. Unlike true BPE the pattern
    * needn't cover whitespace (extract-all skips gaps), which keeps the
    * count a single codegen'd projection.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Mean token length in characters: non-space chars / tokens. */
  def avgWordLen(text: Column): Column =
    length(regexp_replace(trim(text), "\\s+", "")).cast("double") / tokenCount(text)

  /** Count of tokens present in `words` — native one-pass expression
    * (graft.expressions.TokenSetHits); same result as
    * `size(filter(tokens(text), array_contains(words, _)))`.
    */
  def tokenSetHits(text: Column, words: Seq[String]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.TokenSetHits(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), words))

  /** Fraction of tokens that are in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    tokenSetHits(text, stopwords).cast("double") / tokenCount(text)

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("double") /
      length(text)

  /** Per-language stopword hit counts; the language with the highest count
    * wins (ties broken by the order of `profiles`). An n-gram-free heuristic
    * language ID: cheap, codegen'd, and good enough to route documents into
    * per-language pipelines.
    */
  def languageId(text: Column, profiles: Seq[(String, Seq[String])]): Column = {
    val scores = profiles.map { case (lang, stops) =>
      lang -> tokenSetHits(text, stops)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Composite quality score in [0,1]: mean of clamped component scores
    * (length in range, stopword presence, word-length sanity). The weights
    * mirror common pretraining-data filters (length / stopword / word-shape
    * heuristics).
    */
  def qualityScore(text: Column, stopwords: Seq[String],
      minChars: Int = 50, maxChars: Int = 5000): Column = {
    val lenOk = when(length(text).between(minChars, maxChars), 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text, stopwords) > 0.0, 1.0).otherwise(0.0)
    val wordOk = when(avgWordLen(text).between(2.0, 12.0), 1.0).otherwise(0.0)
    (lenOk + stopOk + wordOk) / 3.0
  }

  /** WHATWG windows-1252 decode of one byte: Java's cp1252 decoder for
    * the defined bytes, but the five bytes cp1252 leaves UNDEFINED
    * (0x81 0x8D 0x8F 0x90 0x9D) pass through as the same-valued C1
    * control character — which is what real-world decoders (browsers,
    * the WHATWG encoding registry, PHP) emit, and what actual crawled
    * mojibake therefore contains. Java instead substitutes U+FFFD there,
    * which would (a) never match real artifacts of \u201d and (b) collide
    * the keys of every target whose UTF-8 carries one of those bytes
    * (\u201d and the zero-width joiner would both key as "\u00e2\u20ac\ufffd",
    * misrepairing unrelated replacement-char text).
    */
  private def cp1252Char(b: Byte): Char = {
    val decoded = new String(Array(b),
      java.nio.charset.Charset.forName("windows-1252")).charAt(0)
    if (decoded == '\ufffd') (b & 0xFF).toChar else decoded
  }

  /** How a string READS when its UTF-8 bytes are decoded as WHATWG
    * windows-1252 — the exact artifact a double-encoding bug produces.
    * Public so gates and specs corrupt test text through the SAME mapping
    * the repair table derives from.
    */
  def mojibakeOf(clean: String): String =
    new String(clean.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(cp1252Char))

  /** The common UTF-8-read-as-Windows-1252 mojibake artifacts and their
    * intended characters — curly quotes, dashes, ellipsis, accented Latin
    * letters, and the Â prefix a double-encoded NBSP leaves. Each artifact
    * is DERIVED from its definition ([[mojibakeOf]] of the target) rather
    * than hand-typed — mojibake keys are exactly the strings a human
    * mistranscribes. Three-byte artifacts (the U+20xx punctuation) precede
    * two-byte ones, so the replace chain never rewrites the prefix of a
    * longer artifact.
    */
  val mojibakeTable: Seq[(String, String)] = Seq(
    "\u2019", "\u2018", "\u201c", "\u201d", "\u2013", "\u2014", "\u2026",
    "\u00e9", "\u00e8", "\u00e1", "\u00f3", "\u00fa", "\u00e4", "\u00f6",
    "\u00fc", "\u00f1", "\u00e7", "\u00a0")
    .map(good => mojibakeOf(good) -> good)

  /** Repair double-encoded (UTF-8 bytes decoded as Windows-1252) text —
    * the ftfy-style cleanup pass a crawled corpus runs before any
    * byte-identity operator (fingerprints, shingle hashes) sees it:
    * "cafÃ©" and "café" must hash identically. A literal replace chain
    * over [[mojibakeTable]] — one fused codegen projection, engine-portable
    * (the same chain replays as nested replace() in an oracle). Text
    * without artifacts passes through untouched.
    */
  def fixMojibake(text: Column): Column =
    mojibakeTable.foldLeft(text) { case (acc, (bad, good)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(bad), good)
    }

  /** Markup removal for crawled text: drop `<...>` tags, decode the five
    * entities that dominate crawled prose (&amp; &lt; &gt; &quot; &nbsp;),
    * collapse whitespace runs, trim. A real boilerplate extractor (DOM
    * parsing, main-content detection) is an external-library seam like the
    * media decoder; THIS is the regex fallback every pipeline keeps for the
    * long tail — and it stays a single fused codegen projection. Patterns
    * deliberately avoid Java-regex-only syntax so an oracle replays them
    * verbatim: `<[^>]*>` and literal entity alternation mean the same thing
    * to RE2. Entity decode happens AFTER tag removal (so `&lt;b&gt;`
    * decodes to a visible `<b>` rather than being re-stripped — decoded
    * entities are content, not markup).
    */
  def stripMarkup(html: Column): Column = {
    val untagged = regexp_replace(html, "<[^>]*>", " ")
    val decoded =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(untagged, "&nbsp;", " "),
              "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&amp;", "&")
    trim(regexp_replace(decoded, "[ \t\n\r]+", " "))
  }

  /** Unicode normalization (UAX #15 NFC by default) — the canonicalization
    * every byte-identity operator (fingerprints, shingle hashes, blocklist
    * probes) needs on multilingual text: composed and decomposed forms of
    * the same visible string are different bytes until normalized. Codegen
    * expression (graft.expressions.NormalizeUnicode), not a UDF; fast-path
    * scan for already-normalized text.
    */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.NormalizeUnicode(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), form))

  /** Canonical form for exact-duplicate detection: lowercase, punctuation
    * stripped, whitespace collapsed.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** The Cyrillic/Greek letters that render identically to Latin ones —
    * the substitutions dedup-evasion actually uses (Unicode TR39
    * confusables, restricted to the bijective single-char core so the
    * mapping is a plain `translate`). Paired with [[zeroWidthClass]],
    * the two cheapest ways to make a copied document hash differently.
    */
  private[graft] val confusables: (String, String) = (
    "аеорсхуАВЕКМНОРСТХіјѕοΑΒΕΖΗΙΚΜΝΟΡΤΧ",
    "aeopcxyABEKMHOPCTXijsoABEZHIKMNOPTX")

  /** Zero-width / invisible code points (ZWSP, ZWNJ, ZWJ, BOM) as a
    * regex class — invisible insertions defeat byte-exact dedup while
    * leaving the rendered text untouched.
    */
  private[graft] val zeroWidthClass = "[\\u200B\\u200C\\u200D\\uFEFF]"

  /** Canonical form for EVASION-RESISTANT exact dedup: strip invisible
    * code points and fold homoglyph confusables to their Latin
    * skeletons, so a document copied with Cyrillic о-for-o swaps or
    * zero-width insertions lands in the same hash bucket as its source.
    * Pure codegen (`translate` + `regexp_replace`), zero shuffle; both
    * steps replay verbatim in the oracle.
    */
  def canonicalForDedup(text: Column): Column =
    translate(regexp_replace(text, zeroWidthClass, ""),
      confusables._1, confusables._2)

  /** [[tokenCount]] with the empty/NULL guard every corpus aggregate
    * needs: empty or whitespace-only text counts 0 tokens (not the
    * split artifact's 1) and NULL text counts 0 (a missing document
    * contributes no token mass — leaving it NULL lets least/greatest
    * null-skipping fabricate tokens downstream). One definition so the
    * data card and the corpus audits can never diverge on the guard.
    */
  def tokenCountOrZero(text: Column): Column =
    when(text.isNull || length(trim(text)) === 0, lit(0L))
      .otherwise(tokenCount(text)).cast("long")

  /** DEFLATE-compressed byte length of the text's UTF-8 bytes at a fixed
    * level — the raw material of the Gopher compression-ratio quality
    * band (graft.expressions.DeflateLength; deterministic, zero shuffle,
    * not SQL-replayable).
    */
  def deflateLen(text: Column, level: Int = 6): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.DeflateLength(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), level))

  /** Compression ratio `deflate_len / raw_bytes` — low means repetitive
    * boilerplate, near-1+ means high-entropy junk; NULL for empty text.
    */
  def compressionRatio(text: Column, level: Int = 6): Column =
    deflateLen(text, level).cast("double") /
      nullif(octet_length(text), lit(0)).cast("double")

  /** Content fingerprint: md5 of the normalized text — stable across
    * engines (used as the exact-dedup key and the oracle-comparable stand-in
    * for a rolling hash).
    */
  def fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))

  /** [[shingles]] over an already-tokenized array column. Prefer this form
    * (with the token array materialized as its own projected column) when
    * composing with further array transforms: `toks` appears in both the
    * sequence bound and the lambda body, and higher-order functions are
    * interpreted with no let-binding — if `toks` is a full split expression
    * rather than an attribute, it is re-evaluated once per element.
    */
  def shinglesOfTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Word n-gram shingles as an array column (empty when fewer than n
    * tokens). Built from sequence+transform+slice: stays inside codegen.
    */
  def shingles(text: Column, n: Int): Column = shinglesOfTokens(tokens(text), n)

  /** 60-bit md5-derived hash per element of a string array — the
    * DuckDB-reproducible hash family
    * (`CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)`).
    */
  def md5Hashes60(strs: Column): Column = transform(strs, md5Hash60(_))

  /** The scalar form: 60-bit md5-derived hash of one string. */
  def md5Hash60(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Positional md5-derived 60-bit shingle hashes (one per n-gram position,
    * document order). md5 is computed identically by DuckDB
    * (`CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)`), which makes
    * fingerprint SELECTIONS over these hashes oracle-comparable — the
    * engine-fast path is [[winnowFingerprints]] over the one-pass FNV
    * expression instead.
    */
  def shingleHashesMd5(text: Column, n: Int): Column =
    md5Hashes60(shingles(text, n))

  /** Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS rolling-hash
    * fingerprint): the distinct minima of every sliding window of `w`
    * consecutive positional shingle hashes. Guarantee: two documents sharing
    * a run of at least w + n - 1 tokens share at least one fingerprint, while
    * only ~1/w of shingles are kept — a document sketch for near-dup and
    * provenance detection whose size is independent of the hash family.
    *
    * One-pass monotonic-deque expression (graft.expressions.Winnow): the
    * equivalent transform+slice+array_min Column form re-evaluates the hash
    * subtree once per window position (interpreted HOFs, no let-binding),
    * which turns an expensive hash child into an O(len²) per-document cost.
    *
    * Null contract: null hash array → null sketch (the Column form it
    * replaced returned an empty array for null input; null-in/null-out is
    * the convention of every expression in graft.expressions and matches
    * what a SQL oracle computes over null text).
    */
  def winnow(positionalHashes: Column, w: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.Winnow(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(positionalHashes), w))

  /** Rolling-hash document fingerprints: one-pass FNV positional shingle
    * hashes (graft.expressions.ShingleHashes, distinct = false) + [[winnow]].
    * Pure projection — zero shuffle, sketch size ~|doc|/w.
    */
  def winnowFingerprints(text: Column, n: Int, w: Int): Column =
    winnow(
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.expressions.ShingleHashes(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(text),
          n, distinct = false)),
      w)

  /** Word n-gram frequency stats `struct(total, n_distinct, max_count,
    * dup_count)` in one pass over the token array
    * (graft.expressions.NgramFreqStats) — a projection, never an
    * explode→groupBy shuffle, because the stats are row-local.
    */
  def ngramFreqStats(text: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.NgramFreqStats(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(tokens(text)), n))

  /** Gopher-style repetition signals (Rae et al., arXiv:2112.11446 §A1.1):
    * fraction of occurrences taken by the single most frequent word
    * (`top_word_frac`), by the most frequent word bigram
    * (`top_bigram_frac`), and the fraction of word trigram occurrences that
    * belong to a repeated trigram (`dup_trigram_frac`). High values flag
    * boilerplate, keyword spam and templated pages; pretraining pipelines
    * drop documents above per-signal thresholds. Too-short documents score
    * 0.0 (no n-grams → no repetition).
    */
  def repetitionSignals(text: Column): Column = {
    def frac(num: Column, den: Column): Column =
      when(den === 0L, 0.0).otherwise(num.cast("double") / den)
    val uni = ngramFreqStats(text, 1)
    val bi = ngramFreqStats(text, 2)
    val tri = ngramFreqStats(text, 3)
    struct(
      uni.getField("total").as("n_words"),
      frac(uni.getField("max_count"), uni.getField("total")).as("top_word_frac"),
      frac(bi.getField("max_count"), bi.getField("total")).as("top_bigram_frac"),
      frac(tri.getField("dup_count"), tri.getField("total")).as("dup_trigram_frac"))
  }
}
