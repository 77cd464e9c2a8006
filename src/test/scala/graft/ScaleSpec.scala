package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Skew

/** Scale-machinery semantics: salted aggregation/join equivalence, bucketed
  * co-located joins (no shuffle in the plan), partition pruning.
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("salted aggregation equals plain aggregation") {
    val li = Tables.lineitem(spark, SparkTestSession.sfDir)
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
    val salted = Skew.saltedAggregate(li, Seq("l_returnflag"), buckets = 8,
      partialAggs = Seq(sum("l_quantity").as("pq"), count(lit(1)).as("pn")),
      finalAggs = Seq(sum("pq").as("q"), sum("pn").as("n")))
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, SparkTestSession.sfDir)
      .select("l_partkey", "l_quantity")
    val p = Tables.part(spark, SparkTestSession.sfDir).select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(p, "l_partkey")
    val salted = Skew.saltedJoin(li, p, "l_partkey", buckets = 4)
      .select(plain.columns.map(col): _*)
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("bucketed tables co-locate the join: no exchange in the plan") {
    spark.sql("CREATE DATABASE IF NOT EXISTS scale_test")
    Tables.orders(spark, SparkTestSession.sfDir)
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("scale_test.orders_bucketed")
    Tables.lineitem(spark, SparkTestSession.sfDir)
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("scale_test.lineitem_bucketed")
    // force the sort-merge path: broadcast would bypass bucketing entirely
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("scale_test.orders_bucketed")
        .join(spark.table("scale_test.lineitem_bucketed"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, SparkTestSession.sfDir).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("ngram-Jaccard stop-shingle cutoff bounds candidate pairs under pathological repetition") {
    import spark.implicits._
    // 120 documents all sharing one ubiquitous trigram plus a unique tail:
    // without the doc-frequency cutoff the shared shingle alone generates
    // 120*119/2 candidate pairs; with maxDocFreq=50 the hot shingle is
    // dropped and NO candidate survives (the unique tails share nothing)
    val docs = (1 to 120).map(i =>
      (i.toLong, s"common shared trigram unique$i tail$i word$i")).toDF("doc_id", "text")
    val pairs = graft.operators.TextDedup.ngramJaccardPairs(
      docs, "doc_id", "text", n = 3, minJaccard = 0.1, maxDocFreq = 50L,
      materialize = true)
    assert(pairs.count() == 0L)
  }

  test("mixture sampling admits ~rate percent at corpus scale") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir)
    val kept = graft.operators.Sampling.mixture(
      docs, "doc_id", "source", Map.empty, defaultPct = 40).count().toDouble
    val frac = kept / docs.count()
    assert(frac > 0.25 && frac < 0.55, s"fraction $frac")
  }

  test("partitioned table writes prune partitions on read") {
    spark.sql("CREATE DATABASE IF NOT EXISTS scale_test")
    Tables.events(spark, SparkTestSession.sfDir)
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date")
      .saveAsTable("scale_test.events_partitioned")
    val pruned = spark.table("scale_test.events_partitioned")
      .filter(col("event_date") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    // a pruned scan reads a single partition directory, not the whole table
    assert(plan.contains("PartitionFilters") || pruned.count() <
      spark.table("scale_test.events_partitioned").count())
    assert(pruned.count() ==
      Tables.events(spark, SparkTestSession.sfDir)
        .filter(to_date(col("ts")) === "2024-01-05").count())
  }
}
