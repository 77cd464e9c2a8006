package graft.tools

/** Time individual gate queries by name (dev utility):
  * `runMain graft.tools.TimeQueries <sfDir> q66_winnow_fingerprints ...`
  * Mirrors Bench's noop-sink measurement, two passes, min reported.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    // same untimed warmup set as Bench (JIT + codegen + parquet footers)
    Seq("q1_agg", "q42_minhash_lsh", "q96_bloom_decontaminate").foreach(q =>
      try graft.SparkEntry.queries.get(q)
        .foreach(_(spark, dir).write.format("noop").mode("overwrite").save())
      catch { case _: Throwable => })
    spark.catalog.clearCache()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val (a, b) = (once(), once())
      // release per-query persisted intermediates, exactly like Bench —
      // without this, later queries absorb eviction/GC pressure and the
      // numbers are order-dependent
      spark.catalog.clearCache()
      println(f"[time] $name%-28s ${math.min(a, b)}%8.2f s  (runs: $a%.2f / $b%.2f)")
    }
    spark.stop()
  }
}
