package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** hashBucket statistical contract: the md5 bucket draw must be (near-)
  * uniform so the realized admission rate of every threshold filter
  * (split / mixture / temperatureMixture) matches the nominal rate. A
  * 16-bit draw mod 10,000 over-admits thresholds ≤ 5536 by ~6.8% relative
  * (65536 % 10000 = 5536 residues occur 7/65536 vs 6/65536); the 32-bit
  * draw's bias is ~2e-6 — these tests fail loudly on the former.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val n = 200000L
  private lazy val keys = spark.range(n).toDF("k").cache()

  test("empirical admission at 10k buckets is within 2% relative of nominal") {
    // thresholds spanning the residue classes the 16-bit draw over-admits
    for (t <- Seq(1000, 2500, 5000)) {
      val admitted = keys
        .filter(Sampling.hashBucket(col("k"), 10000) < t).count()
      val got = admitted.toDouble / n
      val want = t / 10000.0
      // gate at 2% relative: binomial noise at n=200k and t=1000 is
      // sigma ≈ 0.67% RELATIVE (this fixed key set realizes 0.8%), so a
      // 1% gate would sit ~1.5 sigma out and re-roll on any change to the
      // key set; 2% keeps 3-sigma headroom while still failing the 16-bit
      // draw's ~6.8% bias by a wide margin
      assert(math.abs(got - want) / want < 0.02,
        s"threshold $t: admitted $got, nominal $want " +
          f"(rel err ${math.abs(got - want) / want}%.4f)")
    }
  }

  test("bucket values stay in range and are deterministic") {
    val b = keys.select(Sampling.hashBucket(col("k"), 10000).as("b"))
    val mm = b.agg(min(col("b")), max(col("b"))).head
    assert(mm.getInt(0) >= 0 && mm.getInt(1) < 10000)
    val a = b.as[Int].collect()
    val c = keys.repartition(7)
      .select(Sampling.hashBucket(col("k"), 10000).as("b")).as[Int].collect()
    assert(a.sorted.sameElements(c.sorted))
  }

  test("100-bucket split admits trainPct within noise") {
    val split = Sampling.split(keys, "k", trainPct = 90)
    val train = split.filter(col("split") === "train").count()
    val got = train.toDouble / n
    assert(math.abs(got - 0.9) < 0.005, s"train fraction $got, nominal 0.9")
  }
}
