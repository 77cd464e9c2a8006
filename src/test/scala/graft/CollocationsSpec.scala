package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Collocations

/** Lift arithmetic on a hand-countable corpus: a glued pair scores far
  * above independence, an anti-correlated pair below 1.
  */
class CollocationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // "new york" always adjacent (4×); "the cat" never adjacent though both
  // frequent; filler words break independence
  private lazy val docs = Seq(
    "new york is big and the city of new york never sleeps",
    "cat naps while the dog runs in new york today",
    "the weather in new york and the cat nap report"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("glued bigram scores above independence, counts exact") {
    val r = Collocations.bigramLift(docs, "text", minCount = 2L)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    val ny = r(("new", "york"))
    assert(ny.getAs[Long]("c_ab") === 4L)
    assert(ny.getAs[Long]("c_a") === 4L)   // every "new" precedes "york"
    assert(ny.getAs[Long]("c_b") === 4L)
    // T = total tokens, B = total bigrams; lift = (4·T²)/(B·4·4)
    val T = docs.select(org.apache.spark.sql.functions.explode(
      graft.functions.TextFunctions.tokens(
        org.apache.spark.sql.functions.col("text")))).count().toDouble
    val B = T - 3.0 // 3 docs → bigrams per doc = tokens − 1
    val want = (4.0 * T * T) / (B * 4.0 * 4.0)
    assert(math.abs(ny.getAs[Double]("lift") - want) < 1e-12)
    assert(ny.getAs[Double]("lift") > 5.0) // far above independence
  }

  test("support cutoff drops rare pairs") {
    val pairs = Collocations.bigramLift(docs, "text", minCount = 3L)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(pairs === Set(("new", "york")))
  }
}
