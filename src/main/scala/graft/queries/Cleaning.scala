package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.functions.TextFunctions
import graft.operators.{Outliers, ParagraphDedup, Quantiles, Sampling}

/** Web-corpus cleaning surface: paragraph-granular dedup and boilerplate
  * reporting (CCNet's unit of identity), markup stripping, weighted
  * eval-set sampling, and per-source signal standardization. The documents
  * table has no intra-document structure, so the paragraph gates first
  * assemble a paged corpus (docs grouped into source bulletins sharing a
  * header/footer) — the same construct-then-verify pattern the blocklist
  * and contamination gates use, and exactly the shape (shared chrome
  * around unique bodies) paragraph dedup exists for.
  */
object Cleaning {

  /** DuckDB twin of Sampling.md5Bits32(doc_id): first 32 md5 bits of the
    * key's decimal string as a BIGINT — the same fragment the q62/q73
    * bucket oracles replay.
    */
  private val sqlMd5Bits32 =
    "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"

  /** Pages: one row per (source, bucket of 25 consecutive doc_ids) — body
    * paragraphs are the member docs in doc_id order, wrapped in a
    * per-source header and a corpus-wide footer, newline-separated.
    * doc_id is global and sources interleave, so a page holds the 1-2 of
    * its bucket's 25 docs that belong to its source (sf0.01: 500 docs ×
    * 20 sources → 400 pages); every page of a source still shares the
    * header, which is the boilerplate signal under test. Deterministic
    * and cheap: one groupBy.
    */
  private def pages(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("bucket", floor(col("doc_id") / 25).cast("long"))
      .groupBy(col("source"), col("bucket"))
      .agg(concat_ws("\n",
        transform(sort_array(collect_list(struct(col("doc_id"), col("text")))),
          x => x.getField("text"))).as("body"))
      .select(
        concat(col("source"), lit("#"), col("bucket")).as("page_id"),
        concat_ws("\n",
          concat(lit("== "), col("source"), lit(" bulletin ==")),
          col("body"),
          lit("powered by graft")).as("text"))

  private val pagesSql: String =
    """SELECT source || '#' || CAST(CAST(FLOOR(doc_id / 25) AS BIGINT) AS VARCHAR)
      |    AS page_id,
      |  '== ' || source || ' bulletin ==' || chr(10) ||
      |    string_agg(text, chr(10) ORDER BY doc_id) || chr(10) ||
      |    'powered by graft' AS text
      |FROM documents
      |GROUP BY source, FLOOR(doc_id / 25)""".stripMargin

  private val parasSql: String =
    """SELECT page_id,
      |  unnest(string_split(text, chr(10))) AS para,
      |  generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos
      |FROM pages""".stripMargin

  /** q146: CCNet-style paragraph dedup over the paged corpus — every
    * source's header and the global footer collapse to one copy (the
    * lexicographically-first (page, pos) occurrence); unique bodies
    * survive untouched. Oracle replays page assembly, the split, the
    * keep-first rule and the ordered rebuild exactly (paragraph identity
    * is the 64-bit hash on the Spark side, the text itself in SQL —
    * identical grouping absent a 2^-64 collision).
    */
  private val paragraphDedup = QueryDef(
    (s, dir) =>
      ParagraphDedup.dropDuplicateParagraphs(pages(s, dir), "page_id", "text", "\n")
        .select(col("page_id"), col("text"), col("kept_paras"))
        .orderBy("page_id"),
    s"""WITH pages AS ($pagesSql),
       |rawp AS ($parasSql),
       |np AS (SELECT * FROM rawp WHERE para <> ''),
       |dup AS (
       |  SELECT para FROM np GROUP BY para
       |  HAVING COUNT(DISTINCT page_id) >= 2),
       |flags AS (
       |  SELECT np.page_id, np.pos, np.para,
       |    ROW_NUMBER() OVER (PARTITION BY np.para ORDER BY np.page_id, np.pos)
       |      AS rn,
       |    d.para IS NOT NULL AS is_dup
       |  FROM np LEFT JOIN dup d USING (para)),
       |kept AS (SELECT page_id, pos, para FROM flags WHERE NOT is_dup OR rn = 1),
       |agg AS (
       |  SELECT page_id, string_agg(para, chr(10) ORDER BY pos) AS text,
       |    COUNT(*) AS kept_paras
       |  FROM kept GROUP BY page_id)
       |SELECT p.page_id, COALESCE(a.text, '') AS text,
       |  COALESCE(a.kept_paras, 0) AS kept_paras
       |FROM pages p LEFT JOIN agg a USING (page_id)
       |ORDER BY page_id""".stripMargin)

  /** q147: the boilerplate audit over the same paged corpus — paragraphs
    * in ≥ 3 distinct pages with doc frequency and first holder. One
    * header per source plus the global footer (21 rows at sf0.01's 20
    * sources), plus any body text that happens to repeat across pages
    * (both engines tally it identically).
    */
  private val boilerplate = QueryDef(
    (s, dir) =>
      ParagraphDedup.boilerplateReport(pages(s, dir), "page_id", "text", "\n", 3)
        .orderBy(desc("n_docs"), col("para")),
    s"""WITH pages AS ($pagesSql),
       |rawp AS ($parasSql),
       |np AS (SELECT * FROM rawp WHERE para <> '')
       |SELECT para, COUNT(DISTINCT page_id) AS n_docs, MIN(page_id) AS first_doc
       |FROM np GROUP BY para
       |HAVING COUNT(DISTINCT page_id) >= 3
       |ORDER BY n_docs DESC, para""".stripMargin)

  /** q148: fixed-size weighted sample (Efraimidis-Spirakis race) of 100
    * docs proportional to length, without replacement. Rows-only: the race
    * key needs `ln`, the one op engines can differ on in the last ulp —
    * SamplingSpec pins size, determinism and weight-proportional
    * inclusion instead.
    */
  /** q148: Efraimidis-Spirakis weighted sampling without replacement —
    * oracle-green: u comes from the key's md5 and the race key's ln is
    * graft.expressions.JavaLn (Math.log, bitwise-equal to DuckDB's platform
    * ln — built-in log() is StrictMath and can flip the final ulp), so the
    * SELECTION replays exactly: same md5 window, same +1/2^32 uniform,
    * same -ln(u)/w race, same (race, key) tie order.
    */
  private val weightedSample = QueryDef(
    (s, dir) =>
      Sampling.weightedSample(Tables.documents(s, dir), "doc_id",
        col("n_chars"), 100)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id"),
    s"""SELECT doc_id, source, n_chars FROM (
       |  SELECT doc_id, source, n_chars,
       |    -ln((CAST($sqlMd5Bits32 AS DOUBLE) + 1.0) / 4294967296.0)
       |      / CAST(n_chars AS DOUBLE) AS race
       |  FROM documents WHERE n_chars > 0
       |  ORDER BY race, doc_id LIMIT 100)
       |ORDER BY doc_id""".stripMargin)

  /** q149: markup stripping — docs wrapped in deterministic HTML chrome
    * (tags, entities, a link) then cleaned back to prose. The oracle
    * replays the wrap and every replace in the same order; tag regex and
    * whitespace class are RE2-and-Java-identical by construction.
    */
  private val markupStrip = QueryDef(
    (s, dir) => {
      val html = concat(
        lit("<div class=\"doc\"><h1>"), col("source"), lit("</h1><p>"),
        col("text"), lit(" &amp; more</p><br/>&nbsp;<a href=\"http://x\">"),
        col("lang"), lit("</a></div>"))
      Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.stripMarkup(html).as("clean"))
        .withColumn("n_tokens",
          TextFunctions.hashAlignedTokenCount(col("clean")).cast("long"))
        .orderBy("doc_id")
    },
    """WITH wrapped AS (
      |  SELECT doc_id,
      |    '<div class="doc"><h1>' || source || '</h1><p>' || text ||
      |    ' &amp; more</p><br/>&nbsp;<a href="http://x">' || lang ||
      |    '</a></div>' AS html
      |  FROM documents),
      |cleaned AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(
      |      replace(replace(replace(replace(replace(
      |        regexp_replace(html, '<[^>]*>', ' ', 'g'),
      |        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |        '&amp;', '&'),
      |      '[ \t\n\r]+', ' ', 'g')) AS clean
      |  FROM wrapped)
      |SELECT doc_id, clean,
      |  CASE WHEN clean = '' THEN 0
      |    ELSE len(string_split(clean, ' ')) END AS n_tokens
      |FROM cleaned ORDER BY doc_id""".stripMargin)

  /** q150: per-source z-score standardization of document length — integer
    * sums make the mean/std/z a fixed IEEE dag both engines compute
    * bit-identically (a double avg/stddev would drift with sum order).
    */
  private val sourceZscore = QueryDef(
    (s, dir) =>
      Outliers.groupZScore(Tables.documents(s, dir), Seq("source"), "n_chars")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("mean"), col("std"), col("z"))
        .orderBy("doc_id"),
    """WITH s AS (
      |  SELECT source, COUNT(*) AS n,
      |    SUM(CAST(n_chars AS BIGINT)) AS sm,
      |    SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS sq
      |  FROM documents GROUP BY source)
      |SELECT d.doc_id, d.source, d.n_chars,
      |  CAST(s.sm AS DOUBLE) / s.n AS mean,
      |  CASE WHEN CAST(s.sq AS DOUBLE) / s.n
      |      - (CAST(s.sm AS DOUBLE) / s.n) * (CAST(s.sm AS DOUBLE) / s.n) > 0
      |    THEN sqrt(CAST(s.sq AS DOUBLE) / s.n
      |      - (CAST(s.sm AS DOUBLE) / s.n) * (CAST(s.sm AS DOUBLE) / s.n))
      |    ELSE 0.0 END AS std,
      |  CASE WHEN CAST(s.sq AS DOUBLE) / s.n
      |      - (CAST(s.sm AS DOUBLE) / s.n) * (CAST(s.sm AS DOUBLE) / s.n) > 0
      |    THEN (CAST(d.n_chars AS DOUBLE) - CAST(s.sm AS DOUBLE) / s.n)
      |      / sqrt(CAST(s.sq AS DOUBLE) / s.n
      |        - (CAST(s.sm AS DOUBLE) / s.n) * (CAST(s.sm AS DOUBLE) / s.n))
      |    ELSE 0.0 END AS z
      |FROM documents d JOIN s USING (source)
      |ORDER BY doc_id""".stripMargin)

  /** Shared oracle CTE block for the per-source value-domain quantile walk
    * (counts → prefix → type-7 interpolation inputs), parameterized by the
    * quantile list — q151 and q152 must stay on ONE copy of this dag or a
    * future interpolation fix could silently desynchronize them.
    */
  private def quantileWalkSql(qs: String): String =
    s"""counts AS (
       |  SELECT source, CAST(n_chars AS BIGINT) AS v, COUNT(*) AS c
       |  FROM documents WHERE n_chars IS NOT NULL
       |  GROUP BY source, CAST(n_chars AS BIGINT)),
       |pref AS (
       |  SELECT source, v, c,
       |    SUM(c) OVER (PARTITION BY source ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    SUM(c) OVER (PARTITION BY source) AS n,
       |    LEAD(v, 1) OVER (PARTITION BY source ORDER BY v) AS nxt
       |  FROM counts),
       |wanted AS (
       |  SELECT p.source, p.v, p.c, p.cum, p.nxt, u.q,
       |    u.q * (p.n - 1) AS h,
       |    FLOOR(u.q * (p.n - 1)) AS lo,
       |    CEIL(u.q * (p.n - 1)) AS hi
       |  FROM pref p,
       |    (SELECT CAST(q AS DOUBLE) AS q
       |     FROM (SELECT unnest([$qs]) AS q)) u)""".stripMargin

  /** q151: exact per-source length deciles via the value-domain walk —
    * state bounded by distinct lengths, not documents, which is what makes
    * EXACT (not sketched) quantiles feasible at corpus scale. The oracle
    * replays the same counts → prefix → type-7 interpolation dag rather
    * than calling quantile_cont, pinning the arithmetic bit-for-bit
    * (QuantilesSpec separately pins agreement with Spark's `percentile`).
    */
  private val sourceDeciles = QueryDef(
    (s, dir) =>
      Quantiles.exactIntQuantiles(Tables.documents(s, dir), Seq("source"),
        "n_chars", Seq(0.1, 0.25, 0.5, 0.75, 0.9))
        .orderBy("source", "q"),
    s"""WITH ${quantileWalkSql("0.1, 0.25, 0.5, 0.75, 0.9")}
      |SELECT source, q,
      |  CAST(v AS DOUBLE) + (h - lo)
      |    * CAST((CASE WHEN hi < cum THEN v ELSE nxt END) - v AS DOUBLE)
      |    AS quantile
      |FROM wanted
      |WHERE lo >= cum - c AND lo < cum
      |ORDER BY source, q""".stripMargin)

  /** q152: robust per-source scaling — (length − median) / IQR over the
    * exact quartile walk; the outlier-immune twin of q150. Oracle replays
    * the quartile CTE and the same division dag.
    */
  private val robustScale = QueryDef(
    (s, dir) =>
      Quantiles.robustScale(Tables.documents(s, dir), Seq("source"), "n_chars")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("median"), col("iqr"), col("robust_z"))
        .orderBy("doc_id"),
    s"""WITH ${quantileWalkSql("0.25, 0.5, 0.75")},
      |qsel AS (
      |  SELECT source, q,
      |    CAST(v AS DOUBLE) + (h - lo)
      |      * CAST((CASE WHEN hi < cum THEN v ELSE nxt END) - v AS DOUBLE)
      |      AS quantile
      |  FROM wanted WHERE lo >= cum - c AND lo < cum),
      |piv AS (
      |  SELECT source,
      |    MAX(CASE WHEN q = 0.25 THEN quantile END) AS q1,
      |    MAX(CASE WHEN q = 0.5 THEN quantile END) AS median,
      |    MAX(CASE WHEN q = 0.75 THEN quantile END) AS q3
      |  FROM qsel GROUP BY source)
      |SELECT d.doc_id, d.source, d.n_chars, p.median,
      |  p.q3 - p.q1 AS iqr,
      |  CASE WHEN d.n_chars IS NULL OR p.median IS NULL THEN NULL
      |    WHEN p.q3 - p.q1 > 0
      |      THEN (CAST(d.n_chars AS DOUBLE) - p.median) / (p.q3 - p.q1)
      |    ELSE 0.0 END AS robust_z
      |FROM documents d LEFT JOIN piv p USING (source)
      |ORDER BY doc_id""".stripMargin)

  /** q153: per-source weighted sample (5 docs per source, length-
    * weighted) through the native heap exec. Rows-only like q148 — same
    * `ln` race key — with the per-group contract spec-pinned.
    */
  /** q153: q148's race run per source through the native heap exec — same
    * bit-exact JavaLn race key, so the per-group winners replay as a
    * ROW_NUMBER over (race, key) within each source.
    */
  private val weightedBySource = QueryDef(
    (s, dir) =>
      Sampling.weightedSamplePerGroup(Tables.documents(s, dir), "doc_id",
        "source", col("n_chars"), 5)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id"),
    s"""SELECT doc_id, source, n_chars FROM (
       |  SELECT doc_id, source, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY
       |      -ln((CAST($sqlMd5Bits32 AS DOUBLE) + 1.0) / 4294967296.0)
       |        / CAST(n_chars AS DOUBLE) ASC, doc_id ASC) AS rn
       |  FROM documents WHERE n_chars > 0)
       |WHERE rn <= 5 ORDER BY doc_id""".stripMargin)

  /** q155: Unicode NFC canonicalization — docs suffixed with DECOMPOSED
    * accents (e + combining acute) must normalize byte-identical to their
    * precomposed twins, or fingerprint dedup and blocklist probes silently
    * miss multilingual duplicates. The oracle builds the same decomposed
    * bytes with chr() and replays through DuckDB's nfc_normalize — NFC is
    * defined by UAX #15, not the library, so both engines must agree
    * exactly.
    */
  /** q248: EVASION-RESISTANT dedup canonicalization
    * (TextFunctions.canonicalForDedup) — the adversarial complement of
    * q155's NFC story: a copied document with Cyrillic о-for-o homoglyph
    * swaps (Unicode TR39 confusables) or zero-width insertions renders
    * identically but hashes differently, so byte-exact dedup silently
    * keeps the duplicate. The gate plants BOTH evasions (every 7th doc
    * homoglyph-mutated under an offset id, every 11th with a trailing
    * ZWSP; every 77th gets both) and reports the histogram of
    * (normalized-group size × raw-hash variants): the planted copies
    * MUST collapse into their source's normalized group while their raw
    * hashes stay distinct — DuckDB replays translate + zero-width strip
    * + md5 grouping from scratch.
    */
  private val confusablesDedup = QueryDef(
    (s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val homo = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          translate(col("text"), "aeopcxy", "аеорсху").as("text"))
      val zw = docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit("\u200B")).as("text"))
      docs.unionByName(homo).unionByName(zw)
        .select(md5(col("text")).as("raw_h"),
          md5(TextFunctions.canonicalForDedup(col("text"))).as("norm_h"))
        .groupBy("norm_h")
        .agg(count(lit(1)).as("sz"),
          countDistinct(col("raw_h")).as("raw_variants"))
        .groupBy("sz", "raw_variants")
        .agg(count(lit(1)).as("n_groups"))
        .orderBy("sz", "raw_variants")
    },
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, translate(text, 'aeopcxy', 'аеорсху')
      |  FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000, text || chr(8203)
      |  FROM documents WHERE doc_id % 11 = 0),
      |normed AS (
      |  SELECT md5(text) AS raw_h,
      |    md5(translate(
      |      regexp_replace(text,
      |        '[' || chr(8203) || chr(8204) || chr(8205) || chr(65279) || ']',
      |        '', 'g'),
      |      'аеорсхуАВЕКМНОРСТХіјѕοΑΒΕΖΗΙΚΜΝΟΡΤΧ',
      |      'aeopcxyABEKMHOPCTXijsoABEZHIKMNOPTX')) AS norm_h
      |  FROM corpus),
      |g AS (SELECT norm_h, COUNT(*) AS sz, COUNT(DISTINCT raw_h) AS raw_variants
      |      FROM normed GROUP BY 1)
      |SELECT sz, raw_variants, COUNT(*) AS n_groups
      |FROM g GROUP BY 1, 2 ORDER BY sz, raw_variants""".stripMargin)

  private val unicodeNfc = QueryDef(
    (s, dir) => {
      // combining marks spelled as escapes: cafe + U+0301, nai + U+0308 + ve
      val decomposed = concat(col("text"), lit(" cafe\u0301 nai\u0308ve"))
      // precomposed twins: U+00E9, U+00EF
      val precomposed = concat(col("text"), lit(" caf\u00e9 na\u00efve"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.normalizeUnicode(decomposed).as("norm"),
          (TextFunctions.normalizeUnicode(decomposed) === precomposed)
            .as("nfc_equal"))
        .orderBy("doc_id")
    },
    """SELECT doc_id,
      |  nfc_normalize(text || ' cafe' || chr(769) || ' nai' || chr(776) || 've')
      |    AS norm,
      |  nfc_normalize(text || ' cafe' || chr(769) || ' nai' || chr(776) || 've')
      |    = (text || ' caf' || chr(233) || ' na' || chr(239) || 've')
      |    AS nfc_equal
      |FROM documents ORDER BY doc_id""".stripMargin)

  /** q163: URL canonicalization + URL-level dedup — the crawl frontier's
    * first dedup tier. Messy variants (scheme/host case, default ports,
    * fragments, utm_/gclid tracking params, bare trailing slash) are built
    * deterministically in pairs per page id, canonicalized, and grouped:
    * every pair must collapse to one canonical URL. The oracle replays the
    * construction and the exact regex chain (Java∩RE2 common subset; 'g'
    * flag mirrors Spark's replace-all default).
    */
  private val urlCanonical = QueryDef(
    (s, dir) => {
      val b = expr("doc_id div 2")
      val url = when(col("doc_id") % 2 === 0,
          when(b % 10 === 0, lit("HTTPS://Root.Example.COM:443/"))
            .otherwise(concat(lit("HTTP://WWW.Example.COM:80/p/"),
              b.cast("string"), lit("/?utm_campaign=spring&k="),
              (b % 5).cast("string"), lit("#top"))))
        .otherwise(
          when(b % 10 === 0, lit("https://root.example.com"))
            .otherwise(concat(lit("http://www.example.com/p/"),
              b.cast("string"), lit("?k="), (b % 5).cast("string"))))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.UrlFunctions.canonicalizeUrl(url).as("canon"))
        .groupBy("canon")
        .agg(count(lit(1)).as("n_urls"), min(col("doc_id")).as("first_doc"))
        .orderBy("canon")
    },
    """WITH u AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN
      |      CASE WHEN (doc_id // 2) % 10 = 0 THEN 'HTTPS://Root.Example.COM:443/'
      |        ELSE 'HTTP://WWW.Example.COM:80/p/' || CAST(doc_id // 2 AS VARCHAR)
      |          || '/?utm_campaign=spring&k=' || CAST((doc_id // 2) % 5 AS VARCHAR)
      |          || '#top' END
      |    ELSE
      |      CASE WHEN (doc_id // 2) % 10 = 0 THEN 'https://root.example.com'
      |        ELSE 'http://www.example.com/p/' || CAST(doc_id // 2 AS VARCHAR)
      |          || '?k=' || CAST((doc_id // 2) % 5 AS VARCHAR) END
      |    END AS url
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
      |    lower(regexp_extract(url,
      |      '^[A-Za-z]+://([A-Za-z0-9.-]+(:[0-9]+)?)', 1)) AS host,
      |    regexp_replace(url,
      |      '^[A-Za-z]+://[A-Za-z0-9.-]+(:[0-9]+)?', '') AS rest
      |  FROM u),
      |norm AS (
      |  SELECT doc_id, scheme,
      |    CASE WHEN scheme = 'http' THEN regexp_replace(host, ':80$', '')
      |         WHEN scheme = 'https' THEN regexp_replace(host, ':443$', '')
      |         ELSE host END AS host2,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(
      |            regexp_replace(
      |              regexp_replace(
      |                regexp_replace(rest, '#.*', '', 'g'),
      |                '([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*', '\1', 'g'),
      |              '&+', '&', 'g'),
      |            '\?&', '?', 'g'),
      |          '[?&]+$', '', 'g'),
      |        '^([^?]*?)/+\?', '\1?', 'g'),
      |      '^([^?]*)/+$', '\1', 'g') AS rest2
      |  FROM parts)
      |SELECT scheme || '://' || host2 || rest2 AS canon,
      |  COUNT(*) AS n_urls, MIN(doc_id) AS first_doc
      |FROM norm GROUP BY 1 ORDER BY canon""".stripMargin)

  /** q177: C4-style line filter (Raffel et al. 2020 §2.2) over a
    * constructed three-line corpus — a punctuation-less title, the
    * document body with terminal punctuation, and a cookie-notice footer —
    * so each rule (min words, terminal punctuation, phrase blocklist)
    * fires on a distinct line. Pure fused projection; the oracle replays
    * the assembly and all three rules with list_filter.
    */
  private val c4LineFilter = QueryDef(
    (s, dir) => {
      val lined = Tables.documents(s, dir).select(col("doc_id"),
        concat(lit("Title of doc "), col("doc_id"), lit("\n"),
          col("text"), lit(".\n"), lit("Read our cookie policy.")).as("text"))
      graft.operators.LineFilter.c4LineFilter(lined, "text", minWords = 30)
        .select("doc_id", "n_lines", "kept_lines", "text")
        .orderBy("doc_id")
    },
    """WITH lined AS (SELECT doc_id,
      |    'Title of doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
      |      text || '.' || chr(10) || 'Read our cookie policy.' AS text
      |  FROM documents),
      |split AS (SELECT doc_id, string_split(text, chr(10)) ls FROM lined),
      |f AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
      |    list_filter(ls, l ->
      |      len(string_split(trim(l), ' ')) >= 30
      |      AND regexp_matches(rtrim(l), '[.!?"]$')
      |      AND NOT contains(lower(l), 'lorem ipsum')
      |      AND NOT contains(lower(l), 'cookie')
      |      AND NOT contains(lower(l), 'javascript')) AS kept
      |  FROM split)
      |SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS kept_lines,
      |  COALESCE(array_to_string(kept, chr(10)), '') AS text
      |FROM f ORDER BY doc_id""".stripMargin)

  /** The clean suffix q183 corrupts and repairs: one artifact from each
    * mojibake class (accented letter, dash, curly quotes incl. the
    * U+009D-producing right quote, ellipsis).
    */
  private val mojiClean = " caf\u00e9 \u2014 \u201cquoted\u201d\u2026"

  /** q183: ftfy-style mojibake repair — append the suffix double-encoded
    * (UTF-8 bytes read back as Windows-1252, computed from the definition,
    * not hand-typed), then fix; the oracle replays the same corruption and
    * the same replace chain, generated from the SAME table so the two can
    * never drift. Repair must restore the text byte-exactly (the gate
    * compares full text), because downstream fingerprints hash bytes.
    */
  private val fixMojibake = QueryDef(
    (s, dir) => {
      val bad = TextFunctions.mojibakeOf(mojiClean)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.fixMojibake(concat(col("text"), lit(bad))).as("text"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .orderBy("doc_id")
    }, {
      val bad = TextFunctions.mojibakeOf(mojiClean)
      val chain = TextFunctions.mojibakeTable.foldLeft(
        s"text || '$bad'") { case (acc, (b, g)) => s"replace($acc, '$b', '$g')" }
      s"""SELECT doc_id, $chain AS text, CAST(length($chain) AS BIGINT) AS n_chars
         |FROM documents ORDER BY doc_id""".stripMargin
    })

  def defs: Map[String, QueryDef] = Map(
    "q183_fix_mojibake" -> fixMojibake,
    "q177_c4_line_filter" -> c4LineFilter,
    "q163_url_canonical" -> urlCanonical,
    "q146_paragraph_dedup" -> paragraphDedup,
    "q147_boilerplate_report" -> boilerplate,
    "q148_weighted_sample" -> weightedSample,
    "q149_markup_strip" -> markupStrip,
    "q150_source_zscore" -> sourceZscore,
    "q151_source_deciles" -> sourceDeciles,
    "q152_robust_scale" -> robustScale,
    "q153_weighted_by_source" -> weightedBySource,
    "q155_unicode_nfc" -> unicodeNfc,
    "q248_confusables_dedup" -> confusablesDedup)
}
