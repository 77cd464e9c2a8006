package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LogisticQuality, Sampling}

/** Logistic quality classifier: training must actually learn (loss
  * descends, holdout accuracy separates an honest signal), scoring must be
  * deterministic and length-invariant, and the zero-feature contract must
  * match the LM scorers'.
  */
class LogisticQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = graft.core.Tables.documents(spark, SparkTestSession.sfDir)
    .withColumn("y", (col("lang") === "en").cast("int"))
    .cache()

  lazy val split = Sampling.split(docs, "doc_id", 80)
  lazy val train = split.filter(col("split") === "train")
  lazy val holdout = split.filter(col("split") === "holdout")

  lazy val model = LogisticQuality.train(
    train, "text", col("y"), dim = 256, maxN = 1, iters = 25, lr = 2.0)

  // a SEPARABLE labeling: positives carry planted marker tokens (the
  // corpus' lang tag is only weakly reflected in its shared synthetic
  // vocabulary, so it can't anchor an accuracy bar). Labels come from
  // doc_id parity — INDEPENDENT of the md5 draw behind Sampling.split, so
  // the train/holdout fold can't correlate with the class (a same-hash
  // labeling makes the holdout single-class and the test meaningless).
  // Markers repeat ×8: under the averaged-bag representation a marker's
  // logit contribution is count/n_tokens, and 25 GD iterations grow its
  // weight to ~0.5 — at ×2 on ~70-token docs that is the same order as
  // the intercept the slightly-imbalanced fold learns (verified: 0.71
  // accuracy), at ×8 the signal dominates and the boundary is clean.
  lazy val planted = docs
    .withColumn("py", (col("doc_id") % 2).cast("int"))
    .withColumn("ptext",
      when(col("py") === 1,
        concat(col("text"), lit(" goodsig" * 8)))
        .otherwise(concat(col("text"), lit(" badsig" * 8))))

  test("training separates a planted signal on a hash holdout") {
    val ps = Sampling.split(planted, "doc_id", 80)
      .withColumnRenamed("split", "fold")
    val ptrain = ps.filter(col("fold") === "train")
    val pheld = ps.filter(col("fold") === "holdout")
    val m = LogisticQuality.train(
      ptrain, "ptext", col("py"), dim = 256, maxN = 1, iters = 25, lr = 2.0)
    val acc = LogisticQuality.logits(pheld, "doc_id", "ptext", m)
      .join(pheld.select("doc_id", "py"), "doc_id")
      .agg(avg((col("pred") === (col("py") === 1)).cast("double")))
      .collect().head.getDouble(0)
    assert(acc > 0.95, s"holdout accuracy $acc")
  }

  test("on the real corpus the model beats the majority baseline") {
    val scored = LogisticQuality.logits(holdout, "doc_id", "text", model)
      .join(holdout.select("doc_id", "y"), "doc_id")
    val acc = scored
      .agg(avg((col("pred") === (col("y") === 1)).cast("double")))
      .collect().head.getDouble(0)
    val base = holdout.agg(
      greatest(avg(col("y").cast("double")),
        lit(1.0) - avg(col("y").cast("double"))))
      .collect().head.getDouble(0)
    assert(acc > base, s"accuracy $acc vs majority $base")
  }

  test("log-loss descends with iterations") {
    val m0 = LogisticQuality.Model(1, new Array[Double](256), 0.0)
    val m5 = LogisticQuality.train(
      train, "text", col("y"), dim = 256, maxN = 1, iters = 5, lr = 2.0)
    val l0 = LogisticQuality.logLoss(train, "text", col("y"), m0)
    val l5 = LogisticQuality.logLoss(train, "text", col("y"), m5)
    val l25 = LogisticQuality.logLoss(train, "text", col("y"), model)
    assert(l5 < l0 && l25 < l5, s"loss not descending: $l0 -> $l5 -> $l25")
  }

  test("scoring is deterministic across partitionings") {
    val a = LogisticQuality.logits(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    val b = LogisticQuality.logits(docs.repartition(13), "doc_id", "text", model)
      .orderBy("doc_id").collect()
    assert(a.map(_.getDouble(2)).toSeq == b.map(_.getDouble(2)).toSeq)
  }

  test("logit is length-invariant: a doubled document scores identically") {
    val two = Seq((1L, "good clean prose"), (2L, "good clean prose good clean prose"))
      .toDF("id", "text")
    val s = LogisticQuality.logits(two, "id", "text", model)
      .orderBy("id").collect()
    assert(s(0).getDouble(2) == s(1).getDouble(2))
  }

  test("zero-feature documents are dropped, not scored") {
    val edge = Seq((1L, "real text"), (2L, ""), (3L, " \t\n ")).toDF("id", "text")
    val s = LogisticQuality.logits(edge, "id", "text", model)
    assert(s.select("id").as[Long].collect().toSeq == Seq(1L))
  }
}
