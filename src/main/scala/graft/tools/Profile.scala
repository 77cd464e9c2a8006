package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.functions.TextFunctions
import graft.operators.TextDedup

/** Phase-level profiling for the heavy dedup operators (dev utility). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(32)
    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    time("docs count")(docs.count())
    time("shingle explode")(
      docs.select(explode(array_distinct(
        TextFunctions.shingles(col("text"), 3))).as("sh")).count())
    time("shingle+hash")(
      docs.select(explode(array_distinct(
        TextFunctions.shingles(col("text"), 3))).as("sh"))
        .select(xxhash64(col("sh")).as("h")).count())
    val sigs = time("minhash signatures")(
      TextDedup.minHashSignatures(docs, "doc_id", "text", 3, 128))
    time("signatures materialize")(sigs.count())
    val cands = time("lsh candidates")(
      TextDedup.lshCandidatePairs(sigs, 32))
    time("candidates materialize")(cands.count())
    time("verify")(
      TextDedup.minHashVerify(cands, sigs, 0.5).count())
    spark.stop()
  }
}
