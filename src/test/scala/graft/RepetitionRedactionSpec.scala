package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Redaction, TextFunctions}
import graft.operators.Sampling

/** Round-3 corpus operators: Gopher-style repetition signals (one-pass
  * NgramFreqStats), PII redaction, and deterministic mixture sampling.
  */
class RepetitionRedactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ngramFreqStats counts totals, distinct, max and duplicated mass") {
    // "a b a b a": words = 5 total, 2 distinct, max 3 (a), all 5 duplicated;
    // bigrams = "a b","b a","a b","b a" → 4 total, 2 distinct, max 2, dup 4;
    // trigrams = "a b a","b a b","a b a" → 3 total, 2 distinct, max 2, dup 2
    val df = Seq("a b a b a").toDF("text")
    val r = df.select(
      TextFunctions.ngramFreqStats(col("text"), 1).as("w"),
      TextFunctions.ngramFreqStats(col("text"), 2).as("b"),
      TextFunctions.ngramFreqStats(col("text"), 3).as("t")).head()
    assert(r.getStruct(0).toSeq == Seq(5L, 2L, 3L, 5L))
    assert(r.getStruct(1).toSeq == Seq(4L, 2L, 2L, 4L))
    assert(r.getStruct(2).toSeq == Seq(3L, 2L, 2L, 2L))
  }

  test("ngramFreqStats: shorter than n yields the zero struct, null text yields null") {
    val df = Seq(Some("only two"), None).toDF("text")
    val rows = df.select(TextFunctions.ngramFreqStats(col("text"), 3).as("s"))
      .collect()
    assert(rows.exists(r => !r.isNullAt(0) && r.getStruct(0).toSeq == Seq(0L, 0L, 0L, 0L)))
    assert(rows.exists(_.isNullAt(0)))
  }

  test("repetitionSignals flags a repeated-bigram document over a diverse one") {
    val df = Seq(
      (1L, "buy now buy now buy now buy now"),
      (2L, "the quick brown fox jumps over lazy dogs")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextFunctions.repetitionSignals(col("text")).as("r"))
      .select(col("doc_id"), col("r.top_bigram_frac"), col("r.dup_trigram_frac"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // doc 1: bigram "buy now" appears 4 of 7 bigrams; every trigram repeats
    assert(got(1L)._1 > 0.5 && got(1L)._2 == 1.0)
    assert(got(2L)._1 < 0.2 && got(2L)._2 == 0.0)
  }

  test("redactPii replaces emails, phones and IPs and counts match") {
    val msg = "mail a.b+c@x-y.org or +44-123-4567 via 192.168.0.1 ok"
    val r = Seq(msg).toDF("t").select(
      Redaction.redactPii(col("t")).as("red"),
      Redaction.emailCount(col("t")).as("e"),
      Redaction.phoneCount(col("t")).as("p"),
      Redaction.ipCount(col("t")).as("i")).head()
    assert(r.getString(0) == "mail <EMAIL> or <PHONE> via <IP> ok")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 1L)))
  }

  test("piiProfile tallies per-group densities on a hand-countable corpus") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("a", "mail me at x@y.io and z@w.io"),     // 2 emails
      ("a", "call +1-555-0100 now"),             // 1 phone
      ("a", "nothing to see"),
      ("b", "host 10.0.0.1 x@y.io +1-555-0100")  // one of each
    ).toDF("src", "msg")
    val got = graft.functions.Redaction.piiProfile(rows, Seq("src"), col("msg"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n_docs") === 3L)
    assert(a.getAs[Long]("n_emails") === 2L)
    assert(a.getAs[Long]("n_phones") === 1L)
    assert(a.getAs[Long]("n_ips") === 0L)
    assert(a.getAs[Long]("docs_with_pii") === 2L)
    assert(math.abs(a.getAs[Double]("pii_rate") - 2.0 / 3.0) < 1e-12)
    val b = got("b")
    assert(b.getAs[Long]("docs_with_pii") === 1L &&
      b.getAs[Double]("pii_rate") === 1.0)
  }

  test("redaction leaves clean text untouched") {
    val msg = "no personal data in this sentence at all"
    val r = Seq(msg).toDF("t").select(Redaction.redactPii(col("t"))).head()
    assert(r.getString(0) == msg)
  }

  test("mixture admits per-source rates deterministically") {
    val df = (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    val rates = Map("src0" -> 100, "src1" -> 0)
    val got = Sampling.mixture(df, "id", "source", rates, defaultPct = 50)
    val bySrc = got.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 100L) // rate 100 keeps everything
    assert(!bySrc.contains("src1")) // rate 0 keeps nothing
    // default-rate sources admit a plausible fraction, and reruns agree
    assert(bySrc.getOrElse("src2", 0L) > 20L && bySrc("src2") < 80L)
    val again = Sampling.mixture(df, "id", "source", rates, defaultPct = 50)
      .select("id").as[Long].collect().toSet
    assert(again == got.select("id").as[Long].collect().toSet)
  }

  test("mixture membership is consistent with split's bucket arithmetic") {
    // a row admitted at rate p is admitted at every rate >= p (bucket is a
    // fixed function of the key, not resampled per rate)
    val df = (0L until 200L).map(i => (i, "s")).toDF("id", "source")
    val at30 = Sampling.mixture(df, "id", "source", Map.empty, 30)
      .select("id").as[Long].collect().toSet
    val at60 = Sampling.mixture(df, "id", "source", Map.empty, 60)
      .select("id").as[Long].collect().toSet
    assert(at30.subsetOf(at60))
  }

  test("stratifiedSample takes exactly N per group, deterministically") {
    val df = (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val got = Sampling.stratifiedSample(df, "id", "grp", nPerGroup = 7)
    val byGrp = got.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp == Map("g0" -> 7L, "g1" -> 7L, "g2" -> 7L))
    // small groups return what they have
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    assert(Sampling.stratifiedSample(tiny, "id", "grp", 5).count() == 3L)
    // same members on rerun (hash rank, not RNG)
    val again = Sampling.stratifiedSample(df, "id", "grp", 7)
      .select("id").as[Long].collect().toSet
    assert(again == got.select("id").as[Long].collect().toSet)
  }

  test("contaminationReport counts distinct overlapping corpus docs per bench doc") {
    import graft.operators.TextDedup
    val corpus = Seq(
      (10L, "alpha bravo charlie delta"), // shares "alpha bravo charlie" with bench 1
      (11L, "alpha bravo charlie echo"),  // also shares with bench 1
      (12L, "zulu yankee xray whiskey")   // shares nothing
    ).toDF("doc_id", "text")
    val bench = Seq(
      (1L, "alpha bravo charlie foxtrot"),
      (2L, "uniform victor whiskey tango")
    ).toDF("doc_id", "text")
    val got = TextDedup.contaminationReport(
      corpus, "doc_id", "text", bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L)) // bench 2 overlaps nothing → absent
  }

  test("URL functions: extraction, primary domain, suffix blocklist") {
    import graft.functions.UrlFunctions._
    val df = Seq(
      (1L, "read https://en.wikipedia.org/wiki/Spark and http://ads.track.net/x"),
      (2L, "only https://docs.example.com/page here"),
      (3L, "no links at all")
    ).toDF("id", "t")
    val got = df.select(col("id"),
        urlDomains(col("t")).as("ds"),
        primaryDomain(col("t")).as("first"),
        hasBlockedDomain(col("t"), Seq(".net")).as("blocked"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getString(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((Seq("en.wikipedia.org", "ads.track.net"), "en.wikipedia.org", true)))
    assert(got(2L) == ((Seq("docs.example.com"), "docs.example.com", false)))
    assert(got(3L) == ((Seq(), "", false)))
  }

  test("canonicalizeUrl collapses scheme/host case, default ports, fragments, tracking") {
    import graft.functions.UrlFunctions.canonicalizeUrl
    val cases = Seq(
      // every messy variant of the same page → one canonical form
      (1L, "HTTP://WWW.Example.COM:80/a/b?x=1&utm_source=nl&y=2#frag"),
      (2L, "http://www.example.com/a/b?x=1&y=2"),
      (3L, "https://Ex.COM:443/"),
      (4L, "https://ex.com"),
      (5L, "http://ex.com/p?gclid=abc123"),
      (6L, "http://ex.com/p"),
      (7L, "http://ex.com/p?utm_a=1&utm_b=2"),           // all params tracking
      (8L, "http://host.com:8080/q?a=1#x"),               // non-default port kept
      (9L, "https://CASE.com/Path/IsCaseSensitive?Q=Up"), // path/query case kept
      (10L, "http://ex.com/p?sgclid=123"),   // NOT a tracking param — kept
      (11L, "http://ex.com/a/gclid=1/b"),    // path text, not a param — kept
      (12L, "http://ex.com/a/b/"),           // trailing path slash drops
      (13L, "http://ex.com/a/?x=1"),         // slash before query folds in
      (14L, "http://ex.com/p?k=v/"),         // slash ending a VALUE is kept
      (15L, "http://ex.com/p?next=/foo/?page=2") // '/?' INSIDE a value kept
    ).toDF("id", "u")
    val got = cases.select(col("id"), canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "http://www.example.com/a/b?x=1&y=2")
    assert(got(1L) == got(2L))
    assert(got(3L) == "https://ex.com" && got(3L) == got(4L))
    assert(got(5L) == "http://ex.com/p" && got(5L) == got(6L) && got(5L) == got(7L))
    assert(got(8L) == "http://host.com:8080/q?a=1")
    assert(got(9L) == "https://case.com/Path/IsCaseSensitive?Q=Up")
    assert(got(10L) == "http://ex.com/p?sgclid=123")
    assert(got(11L) == "http://ex.com/a/gclid=1/b")
    assert(got(12L) == "http://ex.com/a/b")
    assert(got(13L) == "http://ex.com/a?x=1")
    assert(got(14L) == "http://ex.com/p?k=v/")
    assert(got(15L) == "http://ex.com/p?next=/foo/?page=2")
  }

  test("NearestCell content equality enables canonicalization") {
    import graft.expressions.NearestCell
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val child = BoundReference(0, ArrayType(FloatType), nullable = true)
    def mk() = NearestCell(child, Array(0, 1),
      Array(Array(1f, 0f), Array(0f, 1f)))
    // case-class Array params would be reference-equal only; the content
    // override makes semantically identical nodes equal (CSE/canonicalization)
    assert(mk() == mk())
    assert(mk().hashCode() == mk().hashCode())
    assert(mk().semanticEquals(mk()))
    val different = NearestCell(child, Array(0, 1),
      Array(Array(1f, 0f), Array(0f, 2f)))
    assert(mk() != different)
  }
}
