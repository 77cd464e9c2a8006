package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Drift

/** Term-drift report semantics the q128 oracle doesn't pin: ranking
  * direction, symmetry under snapshot swap, new-term surfacing, and the
  * empty-snapshot edge.
  */
class DriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("a term that surges ranks above stable terms; new terms surface") {
    val old = corpus(
      (1L, "stable words here again"),
      (2L, "stable words here again"),
      (3L, "surge"))
    val now = corpus(
      (1L, "stable words here again"),
      (2L, "stable words here again"),
      (3L, "surge surge surge surge surge surge"),
      (4L, "brandnew brandnew"))
    val top = Drift.termDrift(old, now, "text", topK = 10).collect()
    val byTerm = top.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    // surge: 1 -> 6, brandnew: 0 -> 2 — both must out-drift the stable terms
    val stableDrift = byTerm("stable")._3
    assert(byTerm("surge")._3 > stableDrift)
    assert(byTerm("brandnew")._3 > stableDrift)
    assert(byTerm("brandnew")._1 === 0L) // absent side reported as zero
    // ranking is by drift desc then term
    val drifts = top.map(_.getDouble(4))
    assert(drifts.zip(drifts.tail).forall { case (a, b) => a >= b })
  }

  test("swapping snapshots inverts the ratio") {
    val a = corpus((1L, "x x x y"), (2L, "z"))
    val b = corpus((1L, "x y y"), (2L, "z w"))
    val fwd = Drift.termDrift(a, b, "text", topK = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val bwd = Drift.termDrift(b, a, "text", topK = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    fwd.foreach { case (t, r) =>
      assert(math.abs(bwd(t) * r - 1.0) < 1e-12, s"term $t: $r vs ${bwd(t)}")
    }
  }

  test("empty old snapshot: finite ratios, above-uniform terms exceed 1") {
    // with no old mass the smoothed old distribution is uniform over the
    // union vocabulary — so a new term's ratio is its rate relative to
    // uniform: frequent terms > 1, rare terms < 1, all finite
    val old = corpus().filter(lit(false))
    val now = corpus((1L, "fresh fresh fresh start"))
    val top = Drift.termDrift(old, now, "text", topK = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(top.size === 2)
    assert(top.values.forall(r => r > 0.0 && !r.isInfinite && !r.isNaN))
    assert(top("fresh") > 1.0 && top("start") < 1.0)
  }

  test("hellinger: 0 on identical distributions, 1 on disjoint vocabularies") {
    val a = corpus((1L, "x x y"), (2L, "z"))
    def h(o: org.apache.spark.sql.DataFrame, n: org.apache.spark.sql.DataFrame,
        ordered: Boolean) =
      Drift.hellinger(o, n, "text", ordered).collect().head
    for (ord <- Seq(true, false)) {
      assert(math.abs(h(a, a, ord).getAs[Double]("hellinger")) < 1e-12)
      val disjoint = h(a, corpus((1L, "p q r")), ord)
      assert(math.abs(disjoint.getAs[Double]("hellinger") - 1.0) < 1e-12)
      assert(disjoint.getAs[Long]("n_terms") === 6L)
    }
  }

  test("hellinger: hand-computed on a skewed pair; paths agree; empty is NULL") {
    // P = (3/4, 1/4), Q = (1/4, 3/4) over {x, y}
    val o = corpus((1L, "x x x y"))
    val n = corpus((1L, "x y y y"))
    val expected = math.sqrt(
      (math.pow(math.sqrt(0.75) - math.sqrt(0.25), 2) * 2) / 2.0)
    for (ord <- Seq(true, false)) {
      val got = Drift.hellinger(o, n, "text", ordered = ord)
        .collect().head.getAs[Double]("hellinger")
      assert(math.abs(got - expected) < 1e-12, s"ordered=$ord got $got")
    }
    val empty = Drift.hellinger(o, corpus(), "text").collect().head
    assert(empty.isNullAt(empty.fieldIndex("hellinger")))
  }
}
