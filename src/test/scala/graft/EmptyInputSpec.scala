package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior of the round-5 operators: empty corpora,
  * single-source mixtures, and empty snapshot sides must return empty/sane
  * results, not throw — at 100 TB a filter upstream routinely leaves a
  * partition (or a whole input) empty.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emptyDocs =
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
  private lazy val someDocs =
    Seq((1L, "a b c d e f", "s0"), (2L, "g h i j k l", "s1"))
      .toDF("doc_id", "text", "source")

  test("sorted-neighborhood on an empty corpus") {
    assert(graft.operators.SortedNeighborhood.nearDupPairs(
      emptyDocs, "doc_id", "text", "text", window = 3, n = 3, minJaccard = 0.5)
      .count() == 0)
  }

  test("bloom decontamination with an empty blocklist keeps everything") {
    val out = graft.operators.TextDedup.decontaminateBloom(
      someDocs, "doc_id", "text", emptyDocs, "text", n = 3)
    assert(out.count() == 2)
  }

  test("bloom decontamination of an empty corpus") {
    assert(graft.operators.TextDedup.decontaminateBloom(
      emptyDocs, "doc_id", "text", someDocs, "text", n = 3).count() == 0)
  }

  test("temperature mixture with a single source keeps it whole") {
    val one = Seq((1L, "a b c", "only"), (2L, "d e f", "only"))
      .toDF("doc_id", "text", "source")
    assert(graft.operators.Sampling.temperatureMixture(
      one, "doc_id", "source", lit(1L)).count() == 2)
  }

  test("snapshot diff with an empty old side classifies everything added") {
    val neu = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val old = Seq.empty[(Long, Double)].toDF("k", "v")
    val got = graft.operators.SnapshotDiff.diff(old, neu, Seq("k"), Seq("v"))
      .select("change_type").as[String].collect()
    assert(got.length == 2 && got.forall(_ == "added"))
  }

  test("heavy hitters on an empty corpus") {
    assert(graft.operators.HeavyHitters.heavyTokens(
      emptyDocs, "text", minFreq = 1L).count() == 0)
  }

  test("vocabulary of an empty corpus is empty; encode of empty input is empty") {
    val dict = graft.operators.Vocabulary.dictionary(emptyDocs, "text")
    assert(dict.count() == 0)
    assert(graft.operators.Vocabulary.encode(
      emptyDocs, "doc_id", "text", dict).count() == 0)
  }

  test("interval overlap with an empty side") {
    val a = Seq((1L, 0.0, 5.0)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq.empty[(Long, Double, Double)].toDF("b_id", "b_lo", "b_hi")
    assert(graft.operators.RangeJoin.binnedIntervalOverlap(
      a, "a_lo", "a_hi", b, "b_lo", "b_hi", 2.0).count() == 0)
  }

  test("MAD outliers on a constant group flag nothing (MAD = 0)") {
    val df = Seq.fill(10)(("g", 5.0)).toDF("g", "v")
    val out = graft.operators.Outliers.madOutliers(df, Seq("g"), "v", 3.0)
    assert(out.filter(col("is_outlier")).count() == 0)
  }

  test("fuzzy join on an empty table") {
    val df = Seq.empty[(Long, String, String)].toDF("id", "name", "blk")
    assert(graft.operators.FuzzyJoin.blockedPairs(
      df, "id", "name", Seq("blk"), maxDist = 2).count() == 0)
  }

  test("span dedup on an empty corpus: no spans, strip is a no-op frame") {
    assert(graft.operators.SpanDedup.dupSpans(
      emptyDocs, "doc_id", "text", k = 8).count() == 0)
    assert(graft.operators.SpanDedup.stripSpans(
      emptyDocs, "doc_id", "text", k = 8).count() == 0)
  }

  test("unigram LM on an empty corpus trains empty; scoring floors to OOV") {
    val lm = graft.operators.UnigramLm.train(emptyDocs, "text")
    assert(lm.count() == 0)
    // collectLm of an empty LM floors total at 1 → oov = ln 0.5, never ±Inf
    val (terms, logps, oov) = graft.operators.UnigramLm.collectLm(lm)
    assert(terms.isEmpty && logps.isEmpty && oov === math.log(0.5))
    val out = graft.operators.UnigramLm.scoreBroadcast(
      someDocs, "doc_id", "text", terms, logps, oov)
      .select("nll").as[Double].collect()
    assert(out.length == 2 && out.forall(v => math.abs(v + math.log(0.5)) < 1e-12))
  }

  test("empty and whitespace-only documents are unscorable, not perfect-scored") {
    val docs = Seq((1L, "a b", "s"), (2L, "", "s"), (3L, "   ", "s"))
      .toDF("doc_id", "text", "source")
    val (terms, logps, oov) = graft.operators.UnigramLm.collectLm(
      graft.operators.UnigramLm.termCounts(docs, "text"))
    assert(terms.sorted === Seq("a", "b")) // no empty-string vocab pollution
    val scored = graft.operators.UnigramLm.scoreBroadcast(
      docs, "doc_id", "text", terms, logps, oov)
    assert(scored.select("doc_id").as[Long].collect().toSet === Set(1L))
  }

  test("semantic dedup of an empty embedding corpus") {
    val vecs = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(graft.operators.DupGroups.semanticDupGroups(
      vecs, kCells = 4, threshold = 0.3).count() == 0)
  }

  test("ordered LM join path: empty corpus, zero-token and null-text rows") {
    val lm = Seq(("a", -1.0), ("b", -2.0)).toDF("term", "logp")
    assert(graft.operators.UnigramLm.scoreJoinOrdered(
      emptyDocs, "doc_id", "text", lm, oovLogP = -3.0).count() == 0)
    val docs = Seq((1L, "a b", "s"), (2L, "\t \n", "s"),
        (3L, null.asInstanceOf[String], "s"))
      .toDF("doc_id", "text", "source")
    val out = graft.operators.UnigramLm.scoreJoinOrdered(
      docs, "doc_id", "text", lm, oovLogP = -3.0)
      .as[(Long, Long, Double)].collect()
    // zero-token and null-text rows explode to nothing and drop — the same
    // unscorable contract as the kernel path
    assert(out.toSeq === Seq((1L, 2L, 1.5)))
  }

  test("spill-safe top-k fallback on empty input and all-null order values") {
    val empty = Seq.empty[(String, Long, Double)].toDF("g", "id", "v")
    assert(graft.operators.TopK.perGroupWindow(empty, "g", "v", "id", 3).count() == 0)
    val nulls = Seq(("g1", 1L, null.asInstanceOf[java.lang.Double]))
      .toDF("g", "id", "v").select($"g", $"id", $"v".cast("double"))
    assert(graft.operators.TopK.perGroupWindow(nulls, "g", "v", "id", 3).count() == 0)
  }

  test("merge-schema append of an empty evolved batch leaves the table intact") {
    val fmt = graft.sources.ParquetTableFormat
    val tbl = "graft_test_empty_merge"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    fmt.appendMergeSchema(spark, someDocs.select("doc_id", "text"), tbl)
    fmt.appendMergeSchema(spark,
      emptyDocs.select("doc_id", "source"), tbl) // evolved but EMPTY batch
    val out = fmt.read(spark, tbl)
    assert(out.columns.toSet === Set("doc_id", "text", "source"))
    assert(out.count() == 2 &&
      out.filter($"source".isNotNull).count() == 0)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("ngramNovelty against an EMPTY reference scores everything fully novel") {
    val out = graft.operators.TextDedup.ngramNovelty(
      someDocs, emptyDocs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out == Map(1L -> 1.0, 2L -> 1.0))
  }

  test("canonicalPerGroup with an empty cluster assignment yields nothing") {
    val emptyGroups = Seq.empty[(Long, Long)].toDF("doc_id", "group_id")
    assert(graft.operators.DupGroups.canonicalPerGroup(
      emptyGroups, someDocs.withColumn("q", length($"text")), "doc_id", "q")
      .count() == 0)
  }

  test("contentDefinedChunks on an empty corpus and ndcg on empty rankings") {
    assert(graft.operators.Chunking.contentDefinedChunks(
      emptyDocs, "doc_id", "text", k = 3, divisor = 4).count() == 0)
    val emptyRanked =
      Seq.empty[(Long, Long, Int)].toDF("query_id", "neighbor_id", "rank")
    assert(graft.operators.RetrievalEval.ndcg(
      emptyRanked, emptyRanked, k = 5).count() == 0)
  }

  test("round-6 additions on empty corpora") {
    assert(graft.operators.GopherQuality.report(
      emptyDocs, "doc_id", "text", Seq("the")).count() == 0)
    assert(graft.operators.LineFilter.c4LineFilter(emptyDocs, "text")
      .count() == 0)
    assert(graft.operators.TextDedup.ngramContainmentPairs(
      emptyDocs, "doc_id", "text", n = 3, minContainment = 0.5).count() == 0)
    // overlap of an empty side: zero shared, zero grams on that side
    val ov = graft.operators.TextDedup.corpusOverlap(
      emptyDocs, someDocs, "text", "text", n = 3).head()
    assert(ov.getAs[Long]("grams_a") == 0L && ov.getAs[Long]("shared") == 0L)
    assert(graft.operators.Collocations.bigramLift(
      emptyDocs, "text", minCount = 1L).count() == 0)
    assert(graft.operators.Sampling.interleaveBySource(
      emptyDocs, "doc_id", "source").count() == 0)
    assert(graft.operators.Vocabulary.coveragePrune(
      emptyDocs, "text", coverage = 0.9).count() == 0)
    assert(graft.operators.Sampling.shardManifest(
      emptyDocs, "doc_id", "text", nShards = 4, weight = lit(1L)).count() == 0)
    assert(graft.operators.Packing.withGlobalRunningMax(
      Seq.empty[(Long, Long)].toDF("id", "v"), Seq("id"), "v").count() == 0)
    // CDC over an empty change log is the identity
    val base = Seq((1L, "a")).toDF("k", "v")
    val got = graft.operators.Cdc.applyChanges(base,
      Seq.empty[(Long, Long, String, String)].toDF("k", "seq", "op", "v"),
      Seq("k"))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a")))
    // fusing a run with an empty run is the identity ranking
    val run = Seq(("q", 1L, 1), ("q", 2L, 2)).toDF("query_id", "item_id", "rank")
    val emptyRun =
      Seq.empty[(String, Long, Int)].toDF("query_id", "item_id", "rank")
    val fused = graft.operators.RankFusion.rrf(Seq(run, emptyRun))
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(fused == Seq(1L, 2L))
  }

  test("round-7 additions on empty inputs") {
    val emptyRanked =
      Seq.empty[(Long, Long, Int)].toDF("query_id", "neighbor_id", "rank")
    assert(graft.operators.RetrievalEval.rbo(
      emptyRanked, emptyRanked, k = 5).count() == 0)
    // empty corpora: hellinger is NULL (undefined against no distribution)
    val h = graft.operators.Drift.hellinger(emptyDocs, emptyDocs, "text")
      .collect().head
    assert(h.getAs[Long]("n_terms") == 0L)
    assert(h.isNullAt(h.fieldIndex("hellinger")))
    assert(graft.operators.CorpusAudit.ngramDiversity(
      emptyDocs, Seq("source"), "text").count() == 0)
    // an empty reliability table yields an empty PR table, not a crash
    val emptyRel = graft.operators.Calibration.reliability(
      Seq.empty[(Double, Boolean)].toDF("logit", "y"), "logit", $"y",
      Array(0.0, 1.0))
    assert(graft.operators.Roc.prPoints(emptyRel).count() == 0)
  }

  test("BM25 against an empty corpus fails loudly, not silently") {
    intercept[IllegalArgumentException] {
      graft.operators.Bm25.scoreTopK(emptyDocs, "doc_id", "text",
        Seq("q" -> "anything"))
    }
  }

  test("HLL sketch/aggregate on an empty corpus") {
    import graft.operators.HllMd5
    assert(HllMd5.estimate(
      HllMd5.sketch(emptyDocs, "text", Seq("source")), Seq("source")).count() == 0)
    assert(HllMd5.sketchAgg(emptyDocs, "text", Seq("source")).count() == 0)
  }

  test("KMV overlap with a single group yields no pairs; empty corpus no rows") {
    import graft.operators.KmvSketch
    val one = Seq(("s0", "a"), ("s0", "b")).toDF("source", "text")
    val sk = KmvSketch.sketch(one, "text", "source", k = 8)
    assert(KmvSketch.pairwiseOverlap(sk, "source", k = 8).count() == 0)
    assert(KmvSketch.sketchAgg(emptyDocs, "text", "source", k = 8).count() == 0)
  }
}
