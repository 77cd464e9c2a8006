package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Mirrors the reference's cluster configuration intent (AQE + partition
  * coalescing enabled, cf. reference terraform/main.tf:138-139) but sized for
  * `local[N]`: shuffle partitions ≈ cores, not the 200 default. On a real
  * cluster the same builder is used minus `master`, and shuffle partitions are
  * sized to ~2-3× total executor cores (AQE coalesces the excess at runtime).
  */
object Sessions {

  /** Local session tuned for the bench/test environment. */
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // skew-join splitting: a hot key (one domain, one language) otherwise
      // pins a 100 TB join on one straggler task — AQE splits oversized
      // partitions at runtime, complementing the explicit salting in q29
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // NOTE (r10, measured): canChangeCachedPlanOutputPartitioning=true was
      // tried here to let AQE coalesce cached frames' 32-partition layouts
      // (they show up as shuffle.partitions-many near-empty tasks on every
      // cache read). Full-bench result: -2.4 s on the LM queries but +30 s
      // across the minhash/dedup families — the cached signature frames are
      // tiny in BYTES but feed CPU-dense band-join/verify stages, and
      // byte-based coalescing serialized that compute onto 1-2 cores. AQE
      // cannot see CPU density; left OFF deliberately.
      // runtime bloom pruning: a selective dimension filter reaches the
      // fact scan as a bloom probe, cutting shuffle input before it exists
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // runtime SMJ -> shuffled-hash conversion, gated on ACTUAL post-
      // shuffle partition size (guide §3.1): when every map output for a
      // join is under the advisory partition size, hashing the small side
      // beats sorting both. Size-gated at runtime = scale-safe (a 100 TB
      // partition never converts); Spark's docs recommend aligning it
      // with advisoryPartitionSizeInBytes (64 MB default).
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64MB")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static conf (first-session-wins): the default 100-entry generated-
      // class cache thrashes across a 255-query suite (~10 codegen
      // fragments per query); a long-lived driver serving many query
      // shapes wants the same headroom (code cache is already 1g)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Housekeeping.installExitSweep(spark)
    spark
  }

  /** Apply engine defaults to an externally-built session (driver-owned
    * sessions in Verify/Bench): timezone must be UTC for oracle parity, and
    * the engine's SQL functions registered (idempotent).
    */
  /** AQE default, env-overridable (`SPARK_GRAFT_AQE=false`) — a measurement
    * knob for attributing per-stage adaptive-replan overhead in A/B runs,
    * NOT a tuned default: adaptive execution stays ON (skew splitting +
    * partition coalescing are load-bearing at production scale).
    */
  private[graft] val aqeEnabled: String =
    if (sys.env.get("SPARK_GRAFT_AQE").contains("false")) "false" else "true"

  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", aqeEnabled)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // see Sessions.local: runtime size-gated SMJ -> SHJ conversion
    spark.conf.set(
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64MB")
    graft.GraftExtensions.register(spark)
    // expansion-broadcast safety net (see NoBroadcastOverExpansion): a
    // post-construction session can't take injectOptimizerRule, but the
    // experimental user-rule batch runs the same way (idempotent add)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.NoBroadcastOverExpansion))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.NoBroadcastOverExpansion
    // maintained-view rewrite (no-op until a view is registered)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.MvRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.MvRewrite
    // gate hermeticity: this JVM removes its own on-disk gate artifacts at
    // exit, crashed runs included (idempotent; see Housekeeping)
    Housekeeping.installExitSweep(spark)
    spark
  }
}
