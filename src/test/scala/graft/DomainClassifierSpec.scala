package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DomainClassifier

class DomainClassifierSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val ref = Seq(("x", "a a b"), ("y", "b b a"))
    .toDF("source", "text")

  test("hand-checked naive-Bayes scores and margin") {
    val model = DomainClassifier.train(ref, "source", "text")
    assert(model.labels == Seq("x", "y"))
    // shared vocab {a, b}: denom = 3 + 0.5 * 3 = 4.5 per label
    val got = DomainClassifier.tag(
      Seq((1L, "a a")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().head
    assert(got.getString(2) == "x")
    val sx = math.log(1.0 / 2) + (math.log(2.5 / 4.5) + math.log(2.5 / 4.5))
    val sy = math.log(1.0 / 2) + (math.log(1.5 / 4.5) + math.log(1.5 / 4.5))
    assert(got.getDouble(3) == sx - sy)
  }

  test("exact score ties break to the lexicographically smallest label") {
    val model = DomainClassifier.train(ref, "source", "text")
    val got = DomainClassifier.tag(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().head
    // p_x(a)·p_x(b) = p_y(b)·p_y(a) exactly (commutative adds)
    assert(got.getString(2) == "x")
    assert(got.getDouble(3) == 0.0)
  }

  test("OOV tokens score the half-count floor and don't separate labels with equal totals") {
    val model = DomainClassifier.train(ref, "source", "text")
    val got = DomainClassifier.tag(
      Seq((1L, "zzz zzz")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().head
    // both labels: same prior, same total, same OOV floor -> tie -> "x"
    assert(got.getString(2) == "x")
    assert(got.getDouble(3) == 0.0)
  }

  test("priors tilt otherwise-neutral documents toward the bigger source") {
    val skewed = Seq(("x", "a"), ("x", "a"), ("x", "a"), ("y", "a"))
      .toDF("source", "text")
    val model = DomainClassifier.train(skewed, "source", "text")
    val got = DomainClassifier.tag(
      Seq((1L, "q")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().head
    assert(got.getString(2) == "x") // ln(3/4) + oov_x beats ln(1/4) + oov_y
  }

  test("zero-token documents are unscorable and drop") {
    val model = DomainClassifier.train(ref, "source", "text")
    val got = DomainClassifier.tag(
      Seq((1L, ""), (2L, " \t "), (3L, "a")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("tagging stays a single zero-shuffle projection") {
    val model = DomainClassifier.train(ref, "source", "text")
    val plan = DomainClassifier.tag(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }
}
