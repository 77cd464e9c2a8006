package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys at cluster scale.
  *
  * AQE's skew-join splitting handles join-side skew automatically; these
  * cover the aggregation side (a hot groupBy key funnels into one task) and
  * the explicit salted-join form for when AQE is unavailable (e.g. inside a
  * cached subplan).
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on (keys, salt) —
    * spreading a hot key over `buckets` tasks — then final-aggregate on the
    * true keys. Caller supplies *decomposable* partial/final agg pairs (sum
    * of sums, sum of counts, min of mins...). For algebraic aggregates
    * Spark's own partial aggregation usually suffices; salting matters when
    * a downstream window/distinct forces a full shuffle by key.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join of a skewed fact against a dimension: the fact side
    * gets a random-ish salt in [0, buckets); the dim side is exploded
    * `buckets`× so every (key, salt) matches. Use only when the dim side is
    * small enough to replicate.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val explodedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
