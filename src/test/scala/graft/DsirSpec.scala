package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dsir, TextDedup}

/** DSIR importance weighting and incremental dedup: feature construction
  * edges, kernel-vs-Column score equivalence, the statistical direction of
  * the weights (target-like docs outscore off-target docs), Gumbel
  * resampling determinism, and cross-snapshot dedup semantics — everything
  * the q123/q124/q125 oracles don't pin.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val B = 97 // small prime bucket table keeps the specs readable

  test("ngramFeatures: unigrams then bigrams, in position order") {
    val got = Seq("a b c").toDF("t")
      .select(Dsir.ngramFeatures(col("t"), maxN = 2).as("f"))
      .head.getSeq[String](0)
    assert(got === Seq("a", "b", "c", "a b", "b c"))
  }

  test("ngramFeatures: short and empty documents") {
    val rows = Seq("solo", "", "   ", "x y").toDF("t")
      .select(Dsir.ngramFeatures(col("t"), maxN = 2).as("f"))
      .collect().map(_.getSeq[String](0))
    assert(rows(0) === Seq("solo")) // one token: no bigrams
    assert(rows(1) === Seq.empty)
    assert(rows(2) === Seq.empty) // whitespace-only: no artifact token
    assert(rows(3) === Seq("x", "y", "x y"))
  }

  test("featureBuckets kernel == Column formulation, every delimiter/unicode edge") {
    // the one-pass digest must produce exactly the buckets the md5-of-
    // joined-string Column form produces — including multi-byte UTF-8
    // (the corpus has zh documents) and the tokenizer's delimiter edges
    val cases = Seq(
      "the cat sat on the mat",
      "solo",
      "",
      " \t\n",
      "\tleading tab",
      "trailing newline\n",
      "double  space   runs",
      "中文 文档 内容 测试",
      "mixed 中文 and english",
      "a\fb stays one token")
    val df = cases.toDF("t")
    val rows = df.select(
      Dsir.featureBuckets(col("t"), 2, 101).as("fast"),
      transform(Dsir.ngramFeatures(col("t"), 2),
        f => Dsir.featureBucket(f, 101)).as("ref"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1),
        s"mismatch on '${c.replace("\n", "\\n").replace("\t", "\\t")}'")
    }
    // null in → null out
    val n = Seq(Option.empty[String]).toDF("t")
      .select(Dsir.featureBuckets(col("t"), 2, 101).as("r")).head
    assert(n.isNullAt(0))
  }

  test("trainWeightsSubset == trainWeights on the filtered frame") {
    val docs = Seq(
      (1L, "en", "alpha beta gamma"),
      (2L, "en", "beta gamma delta"),
      (3L, "de", "zeta eta theta"),
      (4L, "zh", "iota kappa lambda")).toDF("doc_id", "lang", "text")
    val onePass = Dsir.trainWeightsSubset(
      docs, col("lang") === "en", "text", maxN = 2, numBuckets = B)
    val twoPass = Dsir.trainWeights(
      docs.filter(col("lang") === "en"), docs, "text", maxN = 2, numBuckets = B)
    assert(onePass.toSeq === twoPass.toSeq)
  }

  test("score kernel == Column-formulated fold, bitwise") {
    val weights = Array.tabulate(B)(b => math.sin(b.toDouble)) // arbitrary
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "one"),
      (3L, "a b a b a"),
      (4L, "\tleading tab and\ntokens")).toDF("doc_id", "text")
    val fast = Dsir.score(docs, "doc_id", "text", weights, maxN = 2)
    // reference: same buckets through an element_at fold over a literal
    // weight array — identical order, so the sums must match bitwise
    val wLit = array(weights.map(lit): _*)
    val ref = docs.select(col("doc_id"),
      aggregate(
        transform(Dsir.ngramFeatures(col("text"), 2),
          f => Dsir.featureBucket(f, B)),
        lit(0.0),
        (acc, b) => acc + element_at(wLit, (b + 1).cast("int"))).as("ref"))
    val joined = fast.join(ref, "doc_id").collect()
    assert(joined.length === 4)
    joined.foreach { r =>
      assert(r.getAs[Double]("dsir_logw") === r.getAs[Double]("ref"),
        s"doc ${r.getAs[Long]("doc_id")}")
    }
    // n_features = 2*tokens - 1 under the kernel-aligned tokenizer
    val nf = fast.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_features")).toMap
    assert(nf === Map(1L -> 11L, 2L -> 1L, 3L -> 9L, 4L -> 7L))
  }

  test("score drops unscorable documents and weights tilt toward the target") {
    val target = Seq.tabulate(30)(i => (i.toLong, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val raw = target.union(
      Seq.tabulate(30)(i => (100L + i, "zeta eta theta iota"))
        .toDF("doc_id", "text"))
      .union(Seq((999L, "   ")).toDF("doc_id", "text"))
    val w = Dsir.trainWeights(target, raw, "text", maxN = 2, numBuckets = B)
    val scored = Dsir.score(raw, "doc_id", "text", w, maxN = 2)
    assert(scored.filter(col("doc_id") === 999L).isEmpty) // whitespace-only
    val byDoc = scored.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dsir_logw")).toMap
    // every target-composed doc must outscore every off-target doc
    assert(byDoc(0L) > byDoc(100L))
    assert(byDoc(29L) > byDoc(129L))
    // and greedy selection picks exactly the target-like half
    val top = Dsir.selectTopK(scored, "doc_id", k = 30)
      .select("doc_id").as[Long].collect().toSet
    assert(top === (0L until 30L).toSet)
  }

  test("resampleGumbel: deterministic per seed, biased toward high weights") {
    val target = Seq.tabulate(20)(i => (i.toLong, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val raw = target.union(
      Seq.tabulate(80)(i => (100L + i, "zeta eta theta iota"))
        .toDF("doc_id", "text"))
    val w = Dsir.trainWeights(target, raw, "text", maxN = 2, numBuckets = B)
    val scored = Dsir.score(raw, "doc_id", "text", w, maxN = 2)
      .persist()
    try {
      val a = Dsir.resampleGumbel(scored, "doc_id", k = 20, seed = "s1")
        .select("doc_id").as[Long].collect().toSet
      val b = Dsir.resampleGumbel(scored, "doc_id", k = 20, seed = "s1")
        .select("doc_id").as[Long].collect().toSet
      assert(a === b) // same seed, same sample — on any partitioning
      assert(a.size === 20)
      // 20% of docs carry (much) higher weights; the resample must
      // over-represent them vs their population share
      assert(a.count(_ < 100L) > 4)
    } finally scored.unpersist()
  }

  test("dedupIncrement: drops corpus dupes, keeps lowest in-batch id, keeps novel") {
    val corpus = Seq(
      (1L, "already ingested content"),
      (2L, "another known document")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "Already   ingested CONTENT!"), // normalizes to a corpus dupe
      (11L, "fresh document one"),
      (12L, "fresh document one"), // in-batch dupe: 11 wins
      (13L, "fresh document two")).toDF("doc_id", "text")
    val kept = TextDedup.dedupIncrement(batch, corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(11L, 13L))
    // empty corpus: pure in-batch dedup
    val noCorpus = corpus.filter(lit(false))
    val kept2 = TextDedup.dedupIncrement(batch, noCorpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 === Set(10L, 11L, 13L))
  }
}
