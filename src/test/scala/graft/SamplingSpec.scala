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

  test("upsampleEpochs: whole factors exact, fractional on the bucket draw") {
    val docs = spark.range(2000)
      .select(col("id").as("k"),
        concat(lit("src"), (col("id") % 4).cast("string")).as("source"))
      .cache()
    try {
      val up = Sampling.upsampleEpochs(docs, "k", "source",
        Map("src0" -> 200, "src1" -> 150, "src2" -> 0), defaultPct = 100)
        .cache()
      try {
        val bySrc = up.groupBy("source")
          .agg(count(lit(1)).as("n"), countDistinct(col("k")).as("d"),
            max(col("epoch")).as("m"))
          .collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
          .toMap
        // pct=200: exactly two copies of every row, epochs {0, 1}
        assert(bySrc("src0") === ((1000L, 500L, 1)))
        // pct=150: every row once + ~half a second copy
        val (n1, d1, m1) = bySrc("src1")
        assert(d1 === 500L && m1 === 1)
        assert(math.abs(n1 - 750.0) / 750.0 < 0.1, s"src1 rows $n1, nominal 750")
        // pct=0 drops the source entirely; unlisted sources default to 1 copy
        assert(!bySrc.contains("src2"))
        assert(bySrc("src3") === ((500L, 500L, 0)))
        // epoch indices are contiguous from 0
        val epochs = up.filter(col("source") === "src0")
          .select("epoch").distinct().as[Int].collect().sorted
        assert(epochs === Array(0, 1))
        // deterministic under repartitioning
        val again = Sampling.upsampleEpochs(docs.repartition(7), "k", "source",
          Map("src0" -> 200, "src1" -> 150, "src2" -> 0), defaultPct = 100)
        assert(again.count() === up.count())
        assert(again.select("k", "epoch").except(up.select("k", "epoch")).isEmpty)
      } finally up.unpersist()
    } finally docs.unpersist()
  }

  test("weightedSample: exact size, deterministic, zero-weight excluded") {
    val docs = spark.range(5000)
      .select(col("id").as("k"),
        when(col("id") % 100 === 0, 0L).otherwise(col("id") % 7 + 1).as("w"))
    val a = Sampling.weightedSample(docs, "k", col("w"), 300)
    assert(a.count() === 300L)
    val ids = a.select("k").as[Long].collect().toSet
    assert(!ids.exists(_ % 100 == 0), "zero-weight rows must never win")
    val b = Sampling.weightedSample(docs.repartition(7), "k", col("w"), 300)
      .select("k").as[Long].collect().toSet
    assert(ids === b, "selection must not depend on partitioning")
  }

  test("weightedSamplePerGroup: exact per-group size, deterministic, same race") {
    val docs = spark.range(3000)
      .select(col("id").as("k"),
        concat(lit("g"), (col("id") % 6).cast("string")).as("g"),
        (col("id") % 9 + 1).as("w"))
    val got = Sampling.weightedSamplePerGroup(docs, "k", "g", col("w"), 40)
    val sizes = got.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes.size === 6 && sizes.values.forall(_ === 40L))
    // per-group winners are exactly the global race restricted to the group
    val g0 = docs.filter(col("g") === "g0")
    val wantG0 = Sampling.weightedSample(g0, "k", col("w"), 40)
      .select("k").as[Long].collect().toSet
    val gotG0 = got.filter(col("g") === "g0").select("k").as[Long].collect().toSet
    assert(gotG0 === wantG0, "heap path must agree with the global race per group")
    val again = Sampling.weightedSamplePerGroup(docs.repartition(11), "k", "g",
      col("w"), 40).select("k").as[Long].collect().toSet
    assert(again === got.select("k").as[Long].collect().toSet)
  }

  test("weightedSample: inclusion scales with weight (10x weight ~ 10x rate)") {
    // two weight classes; at a small sampling fraction the E-S race admits
    // class-10 keys ~10x as often as class-1 keys
    val docs = spark.range(100000)
      .select(col("id").as("k"),
        when(col("id") % 2 === 0, 10L).otherwise(1L).as("w"))
    val got = Sampling.weightedSample(docs, "k", col("w"), 2000)
      .select("k").as[Long].collect()
    val heavy = got.count(_ % 2 == 0).toDouble
    val light = got.length - heavy
    val ratio = heavy / math.max(light, 1.0)
    assert(ratio > 7.0 && ratio < 13.0,
      s"heavy/light inclusion ratio $ratio, expected ~10")
  }

  test("allocateBudget: exact total, proportional shares, remainder by largest frac") {
    val docs = Seq(
      ("a", 70L), ("a", 5L),   // w=75
      ("b", 50L),              // w=50
      ("c", 26L)               // w=26; W=151
    ).toDF("source", "n")
    val got = Sampling.allocateBudget(docs, "source", col("n"), 100L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    // shares: a=49.668..., b=33.112..., c=17.218... → bases 49/33/17 = 99,
    // one leftover unit goes to the largest fraction (a, .668)
    assert(got == Map("a" -> ((75L, 50L)), "b" -> ((50L, 33L)), "c" -> ((26L, 17L))))
    assert(got.values.map(_._2).sum == 100L)
  }

  test("epochAudit: epochs ratio, cap flag, capped alloc and surrendered mass") {
    // a: alloc 90 over w=10 → 9 epochs, capped at 4*10=40, surrenders 50
    // b: alloc 10 over w=90 → ~0.11 epochs, untouched
    // z: zero availability → epochs NULL, over_cap false, capped 0
    val alloc = Seq(
      ("a", 10L, 9.0, 9L, 90L),
      ("b", 90L, 0.1, 0L, 10L),
      ("z", 0L, 0.0, 0L, 5L)
    ).toDF("source", "w", "share", "base_alloc", "alloc")
    val got = Sampling.epochAudit(alloc, "source", maxEpochs = 4.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getAs[Double]("epochs") === 9.0)
    assert(got("a").getAs[Boolean]("over_cap"))
    assert(got("a").getAs[Long]("capped_alloc") === 40L)
    assert(got("a").getAs[Long]("surrendered") === 50L)
    assert(!got("b").getAs[Boolean]("over_cap"))
    assert(got("b").getAs[Long]("capped_alloc") === 10L)
    assert(got("b").getAs[Long]("surrendered") === 0L)
    assert(got("z").isNullAt(got("z").fieldIndex("epochs")))
    assert(!got("z").getAs[Boolean]("over_cap"))
    assert(got("z").getAs[Long]("capped_alloc") === 0L)
    assert(got("z").getAs[Long]("surrendered") === 5L)
  }

  test("allocateBudget: exact-sum invariant on corpus data and zero-weight guard") {
    val docs = graft.core.Tables.documents(spark, SparkTestSession.sfDir)
    val out = Sampling.allocateBudget(docs, "source", col("n_chars").cast("long"), 12345L)
    assert(out.agg(sum("alloc")).collect().head.getLong(0) == 12345L)
    // all-zero weights: equal split, exact-sum even when budget > #groups
    val zeros = Seq(("a", 0L), ("b", 0L), ("c", 0L)).toDF("source", "n")
    val z = Sampling.allocateBudget(zeros, "source", col("n"), 2L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(z == Map("a" -> 1L, "b" -> 1L, "c" -> 0L))
    val z5 = Sampling.allocateBudget(zeros, "source", col("n"), 5L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(z5 == Map("a" -> 2L, "b" -> 2L, "c" -> 1L) && z5.values.sum == 5L)
    // a group whose weights are ALL NULL gets weight 0, never poisons the
    // ranking or steals a leftover unit
    val withNull = Seq(("a", Some(3L)), ("b", None), ("b", None))
      .toDF("source", "n")
    val zn = Sampling.allocateBudget(withNull, "source", col("n"), 10L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(zn == Map("a" -> 10L, "b" -> 0L) && zn.values.sum == 10L)
  }

  test("tokenBudgetFillPerGroup: each group's cut equals its standalone fill") {
    val docs = spark.range(300).select(
      col("id").as("k"),
      concat(lit("g"), (col("id") % 3).cast("string")).as("g"),
      (col("id") % 17 + 1).as("w")).cache()
    try {
      val budgetMap = Map("g0" -> 200L, "g1" -> 500L, "g2" -> 50L)
      val budgets = budgetMap.toSeq.toDF("g", "alloc")
      val got = Sampling.tokenBudgetFillPerGroup(docs, "g", Seq("k"), "w", budgets)
      val mass = got.groupBy("g").agg(sum(col("w")).as("m"))
        .as[(String, Long)].collect().toMap
      budgetMap.foreach { case (gk, b) =>
        assert(mass(gk) <= b, s"$gk kept ${mass(gk)} > budget $b")
      }
      // the per-group cut must be EXACTLY the global fill restricted to the
      // group — the group-base subtraction cannot change any boundary
      budgetMap.foreach { case (gk, b) =>
        val solo = Sampling.tokenBudgetFill(
          docs.filter(col("g") === gk), Seq("k"), "w", b)
          .select("k").as[Long].collect().toSet
        val grouped = got.filter(col("g") === gk)
          .select("k").as[Long].collect().toSet
        assert(grouped == solo, s"$gk grouped != standalone")
      }
    } finally docs.unpersist()
  }

  test("shard manifest: partition-invariant, content-sensitive checksum") {
    val docs = spark.range(200).select(col("id").as("k"),
      concat(lit("doc "), col("id")).as("body"))
    def mf(df: org.apache.spark.sql.DataFrame) =
      Sampling.shardManifest(df, "k", "body", nShards = 4, weight = lit(1L))
        .orderBy("shard").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val base = mf(docs)
    assert(base.map(_._2).sum === 200L)            // every row landed
    assert(base === mf(docs.repartition(17)))      // layout-independent
    // a single flipped document changes exactly its shard's checksum
    val tampered = docs.withColumn("body",
      when(col("k") === 42L, lit("doc 42 TAMPERED")).otherwise(col("body")))
    val diff = base.zip(mf(tampered)).filter { case (a, b) => a != b }
    assert(diff.size === 1)
    val (orig, tamp) = diff.head
    assert(orig._1 === tamp._1 && orig._2 === tamp._2 && orig._6 != tamp._6)
  }
}
