package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Sampling

/** Temperature-flattened mixture: admission rates follow sqrt(w_min/w_s),
  * the smallest source is kept whole, and membership is deterministic.
  */
class TemperatureMixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, SparkTestSession.sfDir).cache()

  private def tokens = size(split(trim(col("text")), " +")).cast("long")

  test("the minimum-weight source is admitted in full") {
    val weights = docs.groupBy("source").agg(sum(tokens).as("w"))
      .as[(String, Long)].collect().toMap
    val minSrc = weights.minBy(_._2)._1
    val before = docs.filter(col("source") === minSrc).count()
    val after = Sampling.temperatureMixture(docs, "doc_id", "source", tokens)
      .filter(col("source") === minSrc).count()
    assert(after == before, s"min source $minSrc lost rows: $after/$before")
  }

  test("admission fractions track sqrt(w_min/w_s) within bucket noise") {
    val weights = docs.groupBy("source").agg(sum(tokens).as("w"))
      .as[(String, Long)].collect().toMap
    val wmin = weights.values.min.toDouble
    val beforeN = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    val afterN = Sampling.temperatureMixture(docs, "doc_id", "source", tokens)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    weights.foreach { case (src, w) =>
      val want = math.sqrt(wmin / w)
      val got = afterN.getOrElse(src, 0L).toDouble / beforeN(src)
      // ~100 docs/source at sf0.001: binomial noise is real; just pin the
      // direction and the ballpark
      assert(math.abs(got - want) < 0.25, s"$src: kept $got, expected ~$want")
    }
  }

  test("a zero-weight source is dropped without poisoning the others") {
    val df = Seq(
      (1L, "a b c", "real"), (2L, "d e f", "real"),
      (3L, "", "hollow"), (4L, "", "hollow"))
      .toDF("doc_id", "text", "source")
    val w = when(col("text") === "", 0L).otherwise(3L)
    val kept = Sampling.temperatureMixture(df, "doc_id", "source", w)
      .select("source").as[String].collect()
    assert(kept.nonEmpty && kept.forall(_ == "real"),
      s"expected only 'real' rows, got ${kept.toSeq}")
    assert(kept.length == 2, "the (now-minimum) positive source must survive whole")
  }

  test("membership is deterministic across invocations and repartitionings") {
    val a = Sampling.temperatureMixture(docs, "doc_id", "source", tokens)
      .select("doc_id").as[Long].collect().sorted
    val b = Sampling.temperatureMixture(docs.repartition(13), "doc_id", "source", tokens)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }
}
