package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PrefixFilter

/** Prefix-filtered exact Jaccard join: the no-false-negative guarantee
  * against a brute-force unfiltered join on real documents, and exact
  * identity/sub-threshold behavior on constructed docs.
  */
class PrefixFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("loses no pair vs the unfiltered exact join on real documents") {
    val docs = graft.core.Tables.documents(spark, SparkTestSession.sfDir)
    val out = PrefixFilter.jaccardPairs(docs, "doc_id", "text", t = 0.6, n = 3)
      .select("doc_a", "doc_b", "inter", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // brute force over the SAME shingle sets: every intersecting pair
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(graft.functions.TextFunctions
        .shingleHashesMd5(col("text"), 3))).as("h"))
    val sz = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = toks.toDF("da", "h").join(toks.toDF("db", "h"), Seq("h"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
      .join(sz.toDF("da", "na"), "da").join(sz.toDF("db", "nb"), "db")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.6)
      .select("da", "db", "inter", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(brute.nonEmpty, "corpus should contain qualifying pairs")
    assert(out == brute)
  }

  test("identical docs pair at jaccard 1.0; disjoint docs never pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"),
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val out = PrefixFilter.jaccardPairs(docs, "doc_id", "text", t = 0.6, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("docs below the shingle minimum contribute nothing") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    assert(PrefixFilter.jaccardPairs(docs, "doc_id", "text", t = 0.5, n = 3)
      .count() == 0L)
  }
}
