package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.UnigramLm

/** Unigram LM scoring: analytic values on a hand-built corpus, OOV floor
  * semantics, and join-path/broadcast-path agreement on real documents.
  */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("uniform corpus scores exactly ln(V) per token") {
    // 4 equally-frequent tokens → every token has p = 1/4, nll = ln 4
    val docs = Seq((1L, "a b c d"), (2L, "d c b a")).toDF("doc_id", "text")
    val (terms, logps, oov) = UnigramLm.collectLm(UnigramLm.train(docs, "text"))
    assert(terms.sorted === Seq("a", "b", "c", "d"))
    val nll = UnigramLm.scoreBroadcast(docs, "doc_id", "text", terms, logps, oov)
      .select("nll").as[Double].collect()
    assert(nll.forall(v => math.abs(v - math.log(4)) < 1e-12))
  }

  test("frequent-token documents score lower nll than rare-token documents") {
    val docs = Seq(
      (1L, "x x x x x x x x x y"), // mostly the frequent token
      (2L, "y y")                  // the rare one (still seen in training)
    ).toDF("doc_id", "text")
    val (terms, logps, oov) = UnigramLm.collectLm(UnigramLm.train(docs, "text"))
    val byDoc = UnigramLm.scoreBroadcast(docs, "doc_id", "text", terms, logps, oov)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(byDoc(1L) < byDoc(2L))
  }

  test("OOV tokens take the half-count floor, not a crash or zero") {
    val train = Seq((1L, "a a b b")).toDF("doc_id", "text")
    val (terms, logps, oov) = UnigramLm.collectLm(UnigramLm.train(train, "text"))
    assert(oov === math.log(0.5 / 4))
    val score = Seq((9L, "zzz zzz")).toDF("doc_id", "text")
    val nll = UnigramLm.scoreBroadcast(score, "doc_id", "text", terms, logps, oov)
      .select("nll").as[Double].head()
    assert(math.abs(nll - (-oov)) < 1e-12) // every token at the floor
  }

  test("n_tokens matches the kernel tokenizer on leading \\t/\\n and embedded \\f") {
    // the kernel (TokenWeightSum) delimits on space/\t/\n/\r runs only;
    // n_tokens must count the SAME tokens or the mean NLL divides by the
    // wrong denominator (leading-\t docs: off-by-one; \f docs: \s+ splits
    // a token the kernel keeps whole)
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "\ta b"),      // kernel sees 2 tokens, trim-\s+ saw 3 (empty artifact)
      (3L, "a\fb c"),     // kernel sees 2 tokens ("a\fb", "c"), \s+ saw 3
      (4L, "\t \n")       // kernel sees 0 tokens → unscorable, dropped
    ).toDF("doc_id", "text")
    val (terms, logps, oov) = UnigramLm.collectLm(UnigramLm.train(docs, "text"))
    val out = UnigramLm.scoreBroadcast(docs, "doc_id", "text", terms, logps, oov)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(out === Map(1L -> 4L, 2L -> 2L, 3L -> 2L), s"got $out")
    // and the join path agrees exactly on these counts
    val j = UnigramLm.scoreJoin(docs, "doc_id", "text",
        UnigramLm.train(docs, "text"), oov)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(j === out)
  }

  test("ordered join path is BITWISE equal to the broadcast kernel") {
    // same driver-computed log-probs + same left-to-right positional fold
    // → identical doubles on any partitioning, no tolerance needed
    val docs = Tables.documents(spark, SparkTestSession.sfDir)
    val (terms, logps, oov) = UnigramLm.collectLm(UnigramLm.termCounts(docs, "text"))
    val lm = terms.zip(logps).toDF("term", "logp")
    val b = UnigramLm.scoreBroadcast(docs, "doc_id", "text", terms, logps, oov)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val j = UnigramLm.scoreJoinOrdered(docs.repartition(11), "doc_id", "text", lm, oov)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(b.keySet === j.keySet)
    assert(b.forall { case (id, v) => v == j(id) },
      "ordered fold must reproduce the kernel bit for bit")
  }

  test("join path agrees with the broadcast kernel within float reassociation") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir)
    val lm = UnigramLm.train(docs, "text")
    val (terms, logps, oov) = UnigramLm.collectLm(lm)
    val b = UnigramLm.scoreBroadcast(docs, "doc_id", "text", terms, logps, oov)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val j = UnigramLm.scoreJoin(docs, "doc_id", "text", lm, oov)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(b.keySet === j.keySet)
    // distributed ln (StrictMath) and join-order summation may drift in the
    // last ulps, never materially
    assert(b.forall { case (id, v) => math.abs(v - j(id)) < 1e-9 })
  }
}
