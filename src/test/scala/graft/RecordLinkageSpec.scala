package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FuzzyJoin, RecordLinkage}
import graft.operators.RecordLinkage.FieldSpec

/** Fellegi–Sunter scoring: weight arithmetic, null semantics, the decision
  * bands, and the end-to-end blocking → scoring workflow on planted
  * duplicates.
  */
class RecordLinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val f1 = FieldSpec("city", col("city_a") === col("city_b"), 0.9, 0.1)
  val f2 = FieldSpec("zip", col("zip_a") === col("zip_b"), 0.8, 0.05)

  test("agreement and disagreement weights are the classic log2 odds") {
    assert(math.abs(f1.agreeWeight - math.log(9.0) / math.log(2.0)) < 1e-12)
    assert(math.abs(f1.disagreeWeight - math.log(0.1 / 0.9) / math.log(2.0)) < 1e-12)
    assert(f1.agreeWeight > 0 && f1.disagreeWeight < 0)
  }

  test("pair weight is the exact sum in declared field order") {
    val pairs = Seq(
      (1L, 2L, "ny", "ny", "10001", "10001"), // both agree
      (1L, 3L, "ny", "la", "10001", "10001"), // city differs
      (1L, 4L, "ny", "la", "10001", "90001")  // both differ
    ).toDF("id_a", "id_b", "city_a", "city_b", "zip_a", "zip_b")
    val w = RecordLinkage.scorePairs(pairs, Seq(f1, f2))
      .orderBy("id_b").select("weight").as[Double].collect()
    assert(w(0) == f1.agreeWeight + f2.agreeWeight)
    assert(w(1) == f1.disagreeWeight + f2.agreeWeight)
    assert(w(2) == f1.disagreeWeight + f2.disagreeWeight)
  }

  test("null field values score as disagreement, not as a match boost") {
    val pairs = Seq((1L, 2L, null.asInstanceOf[String], "ny", "10001", "10001"))
      .toDF("id_a", "id_b", "city_a", "city_b", "zip_a", "zip_b")
    val r = RecordLinkage.scorePairs(pairs, Seq(f1, f2)).collect().head
    assert(r.getAs[Boolean]("agree_city") === false)
    assert(r.getAs[Double]("weight") == f1.disagreeWeight + f2.agreeWeight)
  }

  test("classify cuts the weight axis into the three FS bands") {
    val pairs = Seq(
      (1L, 2L, "ny", "ny", "10001", "10001"),
      (1L, 3L, "ny", "la", "10001", "10001"),
      (1L, 4L, "ny", "la", "10001", "90001")
    ).toDF("id_a", "id_b", "city_a", "city_b", "zip_a", "zip_b")
    val d = RecordLinkage.classify(pairs, Seq(f1, f2), lower = -3.0, upper = 6.0)
      .orderBy("id_b").select("decision").as[String].collect().toSeq
    assert(d == Seq("match", "possible", "non_match"))
  }

  test("blocking + scoring finds planted near-duplicate customers") {
    val base = graft.core.Tables.customer(spark, SparkTestSession.sfDir)
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
      .limit(200)
    // plant one typo'd duplicate per 20th customer, shifted key space
    val dups = base.filter(col("c_custkey") % 20 === 0)
      .withColumn("c_custkey", col("c_custkey") + 1000000)
      .withColumn("c_name", concat(substring(col("c_name"), 1, 12),
        lit("X"), substring(col("c_name"), 14, 99)))
    val dirty = base.unionByName(dups)
    val cand = FuzzyJoin.blockedPairs(dirty, "c_custkey", "c_name",
      Seq("c_nationkey"), maxDist = 2)
    val enrich = dirty.select(col("c_custkey").as("id_a"),
      col("c_mktsegment").as("seg_a"))
    val enrichB = dirty.select(col("c_custkey").as("id_b"),
      col("c_mktsegment").as("seg_b"))
    val scored = RecordLinkage.classify(
      cand.join(enrich, "id_a").join(enrichB, "id_b"),
      Seq(
        FieldSpec("name", col("dist") <= 1, 0.95, 0.01),
        FieldSpec("seg", col("seg_a") === col("seg_b"), 0.9, 0.2)),
      lower = 0.0, upper = 4.0)
    val found = scored.filter(col("decision") === "match")
      .filter(col("id_b") - col("id_a") === 1000000)
    val planted = dups.count()
    assert(found.count() == planted, s"expected $planted planted matches")
  }

  test("blockedPairsUnion: each rule proposes, the union dedups, no cartesian") {
    val df = Seq(
      (1L, "ny", "a"), (2L, "ny", "b"), (3L, "ny", "a"),
      (4L, "la", "a"), (5L, "la", "b")
    ).toDF("id", "city", "grp")
    val pairs = RecordLinkage.blockedPairsUnion(df, "id",
      attrs = Seq("city" -> col("city"), "grp" -> col("grp")),
      blockingRules = Seq(Seq("city"), Seq("grp")))
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // city blocks: {1,2,3} and {4,5}; grp blocks: {1,3,4} and {2,5}.
    // (1,3) is proposed by BOTH rules and must appear once.
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L),
      (1L, 4L), (3L, 4L), (2L, 5L)))
    assert(pairs.count() == 7) // distinct, not 8
    intercept[IllegalArgumentException](
      RecordLinkage.blockedPairsUnion(df, "id",
        Seq("city" -> col("city")), Seq(Seq("nope"))))
  }

  test("maxBlockSize degrades oversized blocks to the id-ranked window") {
    // block "ny" has 10 members (> cap 4) → sorted-neighborhood pairs only:
    // each id pairs with the next w=2 ranks. block "la" (2 members ≤ cap)
    // stays exact all-pairs.
    val df = ((1L to 10L).map(i => (i, "ny")) ++ Seq((11L, "la"), (12L, "la")))
      .toDF("id", "city")
    val pairs = RecordLinkage.blockedPairsUnion(df, "id",
      attrs = Seq("city" -> col("city")),
      blockingRules = Seq(Seq("city")),
      maxBlockSize = Some(4), overflowWindow = 2)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val windowed = (1L to 10L).flatMap(i =>
      Seq(i + 1, i + 2).filter(_ <= 10L).map(j => (i, j))).toSet
    assert(got == windowed + ((11L, 12L)))
    // bound holds: an oversized block contributes at most size*w pairs
    assert(got.count(_._2 <= 10L) == 17)
  }

  test("pipeline composes blocking, scoring, and decision as one plan") {
    val df = Seq(
      (1L, "ny", "x", 100.0), (2L, "ny", "x", 150.0), (3L, "ny", "y", 5000.0)
    ).toDF("id", "city", "sfx", "bal")
    val out = RecordLinkage.pipeline(df, "id",
      attrs = Seq("city" -> col("city"), "sfx" -> col("sfx"),
        "bal" -> col("bal")),
      blockingRules = Seq(Seq("city")),
      fields = Seq(
        FieldSpec("sfx", col("sfx_a") === col("sfx_b"), 0.9, 0.1),
        FieldSpec("bal", abs(col("bal_a") - col("bal_b")) < 500.0, 0.8, 0.3)),
      lower = -1.0, upper = 3.0)
    val rows = out.select("id_a", "id_b", "decision").as[(Long, Long, String)]
      .collect().toSet
    // (1,2): both agree → strong match; (1,3)/(2,3): both disagree → non
    assert(rows == Set((1L, 2L, "match"), (1L, 3L, "non_match"),
      (2L, 3L, "non_match")))
  }
}
