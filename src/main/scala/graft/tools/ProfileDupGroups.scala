package graft.tools

import org.apache.spark.sql.functions._

/** Phase breakdown for q69 (embedding dup groups): pair generation vs
  * connected-components closure (dev utility).
  */
object ProfileDupGroups {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(32)
    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val vecs = graft.core.Tables.embeddings(spark, dir)
    time("vec count")(vecs.count())
    val pairs = graft.operators.Similarity.similarPairsBlocked(vecs, "label", 0.3)
      .persist()
    val n = time("pairs materialize")(pairs.count())
    println(s"[profile] n_pairs = $n")
    time("connected components")(
      graft.operators.DupGroups.connectedComponents(pairs, "vec_a", "vec_b").count())
    time("cc second run")(
      graft.operators.DupGroups.connectedComponents(pairs, "vec_a", "vec_b").count())
    spark.stop()
  }
}
