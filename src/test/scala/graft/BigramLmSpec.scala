package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BigramLm

class BigramLmSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val lambda = 0.75

  test("hand-checked interpolated scores on a tiny corpus") {
    val docs = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val model = BigramLm.train(docs, "text", lambda)
    val got = BigramLm.scoreBroadcast(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // unigrams a:3 b:2 total 5; pairs (a,b):2 (b,a):1
    val lpAB = math.log(lambda * (2.0 / 3.0) + (1 - lambda) * (2.0 / 5.0))
    val lpBA = math.log(lambda * (1.0 / 2.0) + (1 - lambda) * (3.0 / 5.0))
    val exp1 = -(math.log(3.0 / 5.0) + lpAB + lpBA) / 3
    val exp2 = -(math.log(3.0 / 5.0) + lpAB) / 2
    assert(got(1L)._1 == 3L && got(1L)._2 == exp1)
    assert(got(2L)._1 == 2L && got(2L)._2 == exp2)
  }

  test("backoff and OOV branches fire when scoring off-corpus text") {
    val ref = Seq((1L, "a b")).toDF("doc_id", "text")
    val model = BigramLm.train(ref, "text", lambda)
    val score = Seq((9L, "a c b b")).toDF("doc_id", "text")
    val got = BigramLm.scoreBroadcast(score, "doc_id", "text", model)
      .collect().head
    // total 2; first a = ln(1/2); c after a = OOV backoff; b after c and
    // b after b = unseen pair -> unigram backoff ln((1-l)*(1/2))
    val exp = -(math.log(1.0 / 2.0) + math.log((1 - lambda) * (0.5 / 2.0)) +
      2 * math.log((1 - lambda) * (1.0 / 2.0))) / 4
    assert(got.getLong(1) == 4L)
    assert(got.getDouble(2) == exp)
  }

  test("kernel matches a straightforward reimplementation, odd whitespace included") {
    val ref = Seq((1L, "x y z x y"), (2L, "y z z")).toDF("doc_id", "text")
    val model = BigramLm.train(ref, "text", lambda)
    val texts = Seq("\tx y\n z", "x  y", "z", "q x", "x  y")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = BigramLm.scoreBroadcast(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val pairLp = model.pairKeys.zip(model.pairLogps).toMap
    val firstLp = model.terms.zip(model.firstLogps).toMap
    val backLp = model.terms.zip(model.backoffLogps).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      // the kernel's rule: split on space/\t/\n/\r only (formfeed and
      // vertical tab are token chars), empties dropped
      val toks = t.split("[ \t\n\r]+").filter(_.nonEmpty)
      var sum = 0.0
      toks.zipWithIndex.foreach { case (tok, j) =>
        sum += (if (j == 0) firstLp.getOrElse(tok, model.oovFirst)
          else pairLp.getOrElse(toks(j - 1) + " " + tok,
            backLp.getOrElse(tok, model.oovBackoff)))
      }
      assert(got(i.toLong) == -sum / toks.length, s"text [$t]")
    }
  }

  test("zero-token documents are unscorable and drop") {
    val ref = Seq((1L, "a b")).toDF("doc_id", "text")
    val model = BigramLm.train(ref, "text", lambda)
    val docs = Seq((1L, ""), (2L, " \t\n "), (3L, "a")).toDF("doc_id", "text")
    val got = BigramLm.scoreBroadcast(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == Set(3L))
    assert(got(3L) == -math.log(1.0 / 2.0))
  }

  test("pairCounts emits nothing for sub-2-token documents") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "  ")).toDF("doc_id", "text")
    assert(BigramLm.pairCounts(docs, "text").count() == 0L)
    val two = Seq((1L, "a b")).toDF("doc_id", "text")
    val rows = BigramLm.pairCounts(two, "text").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      == Seq(("a", "b", 1L)))
  }

  test("scoring stays a single zero-shuffle projection") {
    val ref = Seq((1L, "a b")).toDF("doc_id", "text")
    val model = BigramLm.train(ref, "text", lambda)
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val plan = BigramLm.scoreBroadcast(docs, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }
}
