package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusAudit

/** Truncation-loss arithmetic, chi-square contingency (zero cells,
  * independence), and pooled TTR on hand-computed corpora.
  */
class CorpusAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("truncationAudit: kept/lost split at the context boundary") {
    val docs = Seq(
      ("a", "t1 t2 t3 t4 t5"), // 5 tokens → 2 lost at L=3
      ("a", "t1 t2"),          // under the limit
      ("b", "")                // empty → 0 tokens
    ).toDF("source", "text")
    val got = CorpusAudit.truncationAudit(docs, Seq("source"), "text", 3)
      .orderBy("source").collect()
    assert((got(0).getAs[Long]("docs_truncated"),
      got(0).getAs[Long]("total_tokens"), got(0).getAs[Long]("kept_tokens"),
      got(0).getAs[Long]("lost_tokens")) === ((1L, 7L, 5L, 2L)))
    assert(got(0).getAs[Double]("lost_frac") === 2.0 / 7.0)
    assert(got(1).getAs[Long]("total_tokens") === 0L)
    assert(got(1).isNullAt(got(1).fieldIndex("lost_frac")))
  }

  test("truncationAudit: NULL text contributes zero mass, never fabricated kept tokens") {
    val docs = Seq(("a", Some("t1 t2 t3 t4")), ("a", None))
      .toDF("source", "text")
    val r = CorpusAudit.truncationAudit(docs, Seq("source"), "text", 3)
      .collect().head
    // the NULL doc must not add least(NULL, L) = L to kept_tokens
    assert(r.getAs[Long]("total_tokens") === 4L)
    assert(r.getAs[Long]("kept_tokens") === 3L)
    assert(r.getAs[Long]("lost_tokens") === 1L)
    assert(r.getAs[Long]("kept_tokens") + r.getAs[Long]("lost_tokens") ===
      r.getAs[Long]("total_tokens"))
  }

  test("contingency: NULL category keeps its observed count (null-safe rejoin)") {
    val df = Seq(("train", Some("x")), ("train", None), ("holdout", None))
      .toDF("split", "src")
    val cont = CorpusAudit.contingency(df, "split", "src").collect()
    val tNull = cont.find(r => r.getString(0) == "train" && r.isNullAt(1)).get
    assert(tNull.getAs[Long]("observed") === 1L)
    // grand total preserved: sum of observed equals the corpus size
    assert(cont.map(_.getAs[Long]("observed")).sum === 3L)
  }

  test("contingency materializes zero-observed cells with expected mass") {
    val df = Seq(("train", "x"), ("train", "x"), ("train", "y"),
      ("holdout", "x")).toDF("split", "src")
    val cont = CorpusAudit.contingency(df, "split", "src")
      .orderBy("split", "grp").collect()
    assert(cont.length === 4) // includes (holdout, y) with observed 0
    val hy = cont.find(r => r.getString(0) == "holdout" &&
      r.getString(1) == "y").get
    assert(hy.getAs[Long]("observed") === 0L)
    assert(hy.getAs[Double]("expected") === 1.0 * 1.0 / 4.0)
  }

  test("chiSquare: zero under perfect independence, dof from margins") {
    // 2x2 with observed == expected everywhere → chi2 exactly 0
    val df = (Seq.fill(4)(("train", "x")) ++ Seq.fill(4)(("train", "y")) ++
      Seq.fill(2)(("holdout", "x")) ++ Seq.fill(2)(("holdout", "y")))
      .toDF("split", "src")
    val r = CorpusAudit.chiSquare(
      CorpusAudit.contingency(df, "split", "src")).collect().head
    assert(r.getAs[Long]("n") === 12L)
    assert(r.getAs[Long]("dof") === 1L)
    assert(r.getAs[Double]("chi2") === 0.0)
  }

  test("chiSquare: hand-computed statistic on a skewed 2x2") {
    // cells: (t,x)=3 (t,y)=1 (h,x)=1 (h,y)=3; margins 4/4, N=8, E=2 all
    // chi2 = 4 * (3-2)^2/2 = 2
    val df = (Seq.fill(3)(("t", "x")) ++ Seq.fill(1)(("t", "y")) ++
      Seq.fill(1)(("h", "x")) ++ Seq.fill(3)(("h", "y"))).toDF("split", "src")
    val r = CorpusAudit.chiSquare(
      CorpusAudit.contingency(df, "split", "src")).collect().head
    assert(r.getAs[Double]("chi2") === 2.0)
  }

  test("chiSquare: a NULL category is a real category — in dof and the fold") {
    // 2x2 where one group value is NULL: dof must be (2-1)*(2-1)=1 (a bare
    // countDistinct would drop the NULL column), and the NULL cell's term
    // participates in the ordered fold (NULLs keyed LAST, matching the
    // documented DuckDB ORDER BY replay)
    val df = (Seq.fill(3)(("t", Some("x"))) ++ Seq.fill(1)(("t", None)) ++
      Seq.fill(1)(("h", Some("x"))) ++ Seq.fill(3)(("h", None)))
      .toDF("split", "src")
    val r = CorpusAudit.chiSquare(
      CorpusAudit.contingency(df, "split", "src")).collect().head
    assert(r.getAs[Long]("n") === 8L)
    assert(r.getAs[Long]("dof") === 1L)
    // same margins as the non-NULL skewed 2x2 above → same statistic
    assert(r.getAs[Double]("chi2") === 2.0)
  }

  test("ngramDiversity: hand-counted distinct-n; short docs emit no rows") {
    val docs = Seq(
      ("a", "x y x y"),   // 1g: 4/2 distinct; 2g: "x y","y x","x y" → 3/2; 3g: 2/2
      ("a", "x y"),       // adds 1g: 2 (dup), 2g: "x y" (dup), no 3g
      ("b", "z")          // 1 unigram only — no 2g/3g rows for b
    ).toDF("source", "text")
    val got = CorpusAudit.ngramDiversity(docs, Seq("source"), "text", maxN = 3)
      .orderBy("source", "n").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("n")) ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_distinct"))))
      .toMap
    assert(got(("a", 1)) === ((6L, 2L)))
    assert(got(("a", 2)) === ((4L, 2L)))
    assert(got(("a", 3)) === ((2L, 2L)))
    assert(got(("b", 1)) === ((1L, 1L)))
    assert(!got.contains(("b", 2)) && !got.contains(("b", 3)))
    assert(got.size === 4)
  }

  test("ngramDiversity plan: one scan, no product joins, bounded shuffles") {
    val df = CorpusAudit.ngramDiversity(
      Seq(("a", "x y z")).toDF("source", "text"), Seq("source"), "text")
    graft.core.PlanAudit.requireNoProductJoins(df)
    // count + exact countDistinct per group = the two-phase distinct agg;
    // anything beyond its two exchanges means the single-scan shape broke
    graft.core.PlanAudit.requireMaxShuffles(df, 2)
  }

  test("lexicalDiversity: pooled TTR and the low-TTR band") {
    val docs = Seq(
      ("a", "x x x x x x x x x y"), // ttr 0.2 → low
      ("a", "p q r s"),            // ttr 1.0
      ("b", "")                    // empty → null ttr, not low
    ).toDF("source", "text")
    val got = CorpusAudit.lexicalDiversity(docs, Seq("source"), "text")
      .orderBy("source").collect()
    assert((got(0).getAs[Long]("types"), got(0).getAs[Long]("tokens"),
      got(0).getAs[Long]("low_ttr_docs")) === ((6L, 14L, 1L)))
    assert(got(0).getAs[Double]("pooled_ttr") === 6.0 / 14.0)
    assert(got(1).getAs[Long]("low_ttr_docs") === 0L)
    assert(got(1).isNullAt(got(1).fieldIndex("pooled_ttr")))
  }
}
