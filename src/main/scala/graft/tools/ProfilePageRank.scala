package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.operators.PageRank

/** Phase-level profiling for the PageRank gate (dev utility). */
object ProfilePageRank {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(32)
    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val pairs = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .filter(col("o_custkey") % 10 === 0)
      .join(Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("a"),
        (lit(1000000L) + col("l_suppkey").cast("long")).as("b"))
    time("pairs count")(pairs.count())
    val edges = PageRank.symmetrize(pairs, "a", "b")
    time("edges count")(edges.count())
    val cached = edges.persist()
    time("edges cache")(cached.count())
    time("pr ordered 3it (cold edges)")(
      PageRank.run(edges, "src", "dst", 3, ordered = true).count())
    time("pr ordered 3it (cached)")(
      PageRank.run(cached, "src", "dst", 3, ordered = true).count())
    time("pr unordered 3it (cached)")(
      PageRank.run(cached, "src", "dst", 3, ordered = false).count())
    time("pr ordered 0it (cached)")(
      PageRank.run(cached, "src", "dst", 0, ordered = true).count())
    spark.stop()
  }
}
