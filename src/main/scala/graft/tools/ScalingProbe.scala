package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe: measure the most expensive gate queries at sf0.1 and at a
  * synthetic M× blow-up of the same data, and report the wall-clock ratio
  * per query — the measured evidence that a plan's cost grows linearly with
  * input, which eyeballing `.explain` output cannot give.
  *
  * The M× dataset is M DISJOINT SHARDS of the base data, the shape real
  * growth takes (new crawl dumps, new tenants, new days): every table is
  * fanned out M times with entity keys offset per copy so FK relations stay
  * copy-local — joins, blocked self-joins, and graphs grow M×, not M²×.
  * Document text gets a per-copy letter rotation (a bijective char map):
  * within-copy n-gram/duplicate structure is preserved exactly, cross-copy
  * shingle overlap collapses to zero, so dedup workloads scale the way M
  * genuinely-new shards would rather than manufacturing M-way duplicate
  * clusters of every document.
  *
  * Methodology: one untimed warmup (JIT + codegen + footers), then per
  * query the min of 2 COLD timed passes at each scale — the cache is
  * cleared before every pass so a materialize-style gate's persisted
  * result cannot serve the second pass warm (that asymmetry, warm base vs
  * cold scaled, inflated the first probe's ratios). Output: a markdown
  * table to stdout and SCALING.md, flagging any query whose time ratio
  * exceeds 1.5 × M (the super-linear bar from the round-7 verdict).
  *
  * Dev tool — not part of the shipped library surface.
  */
object ScalingProbe {

  /** The 15 most expensive queries of the round-7 driver bench. */
  val probeQueries: Seq[String] = Seq(
    "q83_bucketed_join", "q161_pagerank", "q84_partition_prune",
    "q154_compaction", "q41_ngram_jaccard", "q175_containment_pairs",
    "q65_medallion", "q214_ngram_diversity", "q164_ngram_novelty",
    "q127_incremental_near_dedup", "q42_minhash_lsh", "q80_ivf_index",
    "q106_corpus_pipeline2", "q159_linkage_score", "q66_winnow_fingerprints")

  private val BIG = 100000000L // per-copy entity-key offset; >> any base key

  /** Per-table fan-out spec: columns offset by copy*BIG (entity keys) and by
    * copy*smallStep (dimension keys with dense small domains).
    */
  private val bigKeys: Map[String, Seq[String]] = Map(
    "region" -> Seq(),
    "nation" -> Seq(),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))
  // nation (25) / region (5) keys are dense small ints — offset by their
  // domain size so each copy is a self-consistent star schema
  private val smallKeys: Map[String, Seq[(String, Long)]] = Map(
    "region" -> Seq("r_regionkey" -> 5L),
    "nation" -> Seq("n_nationkey" -> 25L, "n_regionkey" -> 5L),
    "customer" -> Seq("c_nationkey" -> 25L),
    "supplier" -> Seq("s_nationkey" -> 25L))

  private def caesar(text: org.apache.spark.sql.Column, copy: org.apache.spark.sql.Column) = {
    val abc = "abcdefghijklmnopqrstuvwxyz"
    (1 until 26).foldLeft(when(copy % 26 === 0, text)) { (acc, c) =>
      acc.when(copy % 26 === c, translate(text, abc, abc.drop(c) + abc.take(c)))
    }
  }

  def buildScaled(spark: SparkSession, baseDir: String, outDir: String,
      mult: Int): Unit = {
    val copies = spark.range(mult).select(col("id").as("__copy"))
    for (t <- bigKeys.keys.toSeq.sorted) {
      val base =
        if (t == "events") graft.core.Tables.events(spark, baseDir)
        else spark.read.parquet(s"$baseDir/$t.parquet")
      var fanned = base.crossJoin(broadcast(copies))
      for (k <- bigKeys(t))
        fanned = fanned.withColumn(k, col(k) + col("__copy") * BIG)
      for ((k, step) <- smallKeys.getOrElse(t, Seq()))
        fanned = fanned.withColumn(k, col(k) + col("__copy") * step)
      if (t == "documents")
        fanned = fanned.withColumn("text", caesar(col("text"), col("__copy")))
      fanned.drop("__copy")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("/root/repo/tmp/scaling")
    val mult = args.lift(2).map(_.toInt).getOrElse(10)
    // args(4): optional comma-separated query list overriding the default
    // expensive-15 (e.g. the sketch family)
    val queries = args.lift(4)
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(probeQueries)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaledDir = s"$workDir/sf${mult}x"
    // SPARK_GRAFT_PROBE_REUSE=1 skips the fan-out when the scaled dataset
    // already exists (it is deterministic), so a second query list can be
    // probed at the same scale without the build cost
    if (sys.env.get("SPARK_GRAFT_PROBE_REUSE").contains("1") &&
        new java.io.File(s"$scaledDir/lineitem.parquet").exists()) {
      println(s"[probe] reusing existing ${mult}x dataset at $scaledDir")
    } else {
      println(s"[probe] building ${mult}x dataset at $scaledDir ...")
      val tBuild = System.nanoTime()
      buildScaled(spark, baseDir, scaledDir, mult)
      println(f"[probe] built in ${(System.nanoTime() - tBuild) / 1e9}%.1f s")
    }

    def once(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup: JIT the minhash/bloom/shingle kernels before any timed pass
    Seq("q1_agg", "q42_minhash_lsh", "q96_bloom_decontaminate").foreach(q =>
      try graft.SparkEntry.queries.get(q).foreach(f => once(f, baseDir))
      catch { case _: Throwable => })
    spark.catalog.clearCache()

    // clear the cache between EVERY pass: materialize-style gates persist
    // their result, and Spark's CacheManager matches the next pass's
    // identical plan against it — a warm second base pass vs a cold scaled
    // pass would inflate the ratio by (cold/warm), not measure scaling
    def cold(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      spark.catalog.clearCache()
      once(fn, dir)
    }
    val rows = queries.flatMap { name =>
      graft.SparkEntry.queries.get(name).map { fn =>
        val small = try Seq.fill(2)(cold(fn, baseDir)).min
          catch { case e: Throwable =>
            System.err.println(s"[probe] $name base: $e"); -1.0 }
        val big = try Seq.fill(2)(cold(fn, scaledDir)).min
          catch { case e: Throwable =>
            System.err.println(s"[probe] $name ${mult}x: $e"); -1.0 }
        spark.catalog.clearCache()
        val ratio = if (small > 0 && big > 0) big / small else -1.0
        println(f"[probe] $name%-28s base=$small%7.2fs ${mult}x=$big%8.2fs ratio=$ratio%6.2f")
        (name, small, big, ratio)
      }
    }

    val bar = 1.5 * mult
    val md = new StringBuilder
    md ++= s"# Scaling probe: sf0.1 -> ${mult}x (${queries.size} gate queries)\n\n"
    md ++= s"Method: `graft.tools.ScalingProbe` fans every table out ${mult}x as\n"
    md ++= "disjoint key-offset shards (per-copy letter-rotated document text, so\n"
    md ++= "dedup sees genuinely new shards, not manufactured cross-copy clusters),\n"
    md ++= "then times each query at both scales in one warmed JVM: min of 2 COLD\n"
    md ++= "passes per scale (cache cleared before every pass, so a gate's\n"
    md ++= "materialized result cannot serve the next pass warm).\n"
    md ++= s"Super-linear bar: ratio > 1.5 x M = ${bar}. local[$cpus], " +
      s"heap ${Runtime.getRuntime.maxMemory() / (1024 * 1024)} MB.\n\n"
    md ++= s"| query | base (s) | ${mult}x (s) | ratio | vs bar ${bar} |\n"
    md ++= "|---|---|---|---|---|\n"
    rows.foreach { case (n, s0, s1, r) =>
      val verdict = if (r < 0) "FAILED" else if (r > bar) "**SUPER-LINEAR**" else "ok"
      md ++= f"| $n | $s0%.2f | $s1%.2f | $r%.2f | $verdict |\n"
    }
    val nBad = rows.count { case (_, _, _, r) => r > bar || r < 0 }
    md ++= f"\n${rows.size - nBad} of ${rows.size} within the linear bar.\n"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(args.lift(3).getOrElse("SCALING.md")),
      md.toString.getBytes("UTF-8"))
    println(md.toString)
    spark.stop()
  }
}
