package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.IncrementalAgg
import graft.streaming.IvmStream

/** Continuous IVM over a real file-source CDC stream: the maintained
  * state must equal the batch foldRefresh twin AND a from-scratch
  * recompute — bit-for-bit on the DECIMAL sums — across a checkpoint
  * stop/restart mid-delta, and the versioned state chain must expose
  * every intermediate view.
  */
class IvmStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val groups = Seq("o_orderpriority")
  private val sums = Seq("sum_price" -> "o_totalprice")

  private def rowSet(df: DataFrame): Set[(String, Long, BigDecimal)] =
    df.select(col("o_orderpriority"), col("n"),
      col("sum_price").cast("decimal(18,2)"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
      .toSet

  test("maintained view equals full recompute across a checkpoint restart") {
    val o = Tables.orders(spark, SparkTestSession.sfDir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice").cache()
    val base = IncrementalAgg.state(o, groups, sums)

    val repOld = o.filter(col("o_orderkey") % 83 === 0 &&
        col("o_orderkey") % 89 =!= 0)
      .withColumn("op", lit("delete"))
    val delta = o.filter(col("o_orderkey") % 89 === 0)
      .withColumn("op", lit("delete"))
      .unionByName(repOld)
      .unionByName(repOld.withColumn("op", lit("insert"))
        .withColumn("o_totalprice", col("o_totalprice") + 250.0))
      .unionByName(o.filter(col("o_orderkey") % 79 === 0)
        .withColumn("op", lit("insert")))
      .select("op", "o_orderpriority", "o_totalprice", "o_orderkey")
      .cache()

    val srcDir = java.nio.file.Files.createTempDirectory("graft_ivm_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivm_ckpt")
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_ivm_state").toString
    def stage(df: DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivm_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.move(
        java.nio.file.Files.list(tmp)
          .filter(_.toString.endsWith(".parquet")).findFirst.get,
        java.nio.file.Paths.get(s"$srcDir/$name"))
    }
    def run(): Unit = {
      val deltas = spark.readStream
        .schema("op STRING, o_orderpriority STRING, o_totalprice DOUBLE, o_orderkey BIGINT")
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.toString)
      val q = IvmStream.maintainAggStream(deltas, base, statePath,
        ckpt.toString, "op", groups, sums).start()
      q.processAllAvailable(); q.stop()
    }

    // chunks arrive as files: two before the restart, two after
    val chunks = (0 until 4).map(i =>
      delta.filter(col("o_orderkey") % 4 === i))
    stage(chunks(0), "0.parquet"); stage(chunks(1), "1.parquet")
    run()
    val mid = IvmStream.latestState(spark, statePath).get
    assert(rowSet(mid) ==
      rowSet(IvmStream.foldRefresh(base, chunks.take(2), "op", groups, sums)),
      "state after two chunks diverged from the batch fold twin")

    stage(chunks(2), "2.parquet"); stage(chunks(3), "3.parquet")
    run() // restart on the same checkpoint: versions continue, no re-apply

    // final view == from-scratch recompute of the post-delta base
    val after = o.filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 83 === 0, col("o_totalprice") + 250.0)
          .otherwise(col("o_totalprice")))
      .unionByName(o.filter(col("o_orderkey") % 79 === 0))
    assert(rowSet(IvmStream.latestState(spark, statePath).get) ==
      rowSet(IncrementalAgg.state(after, groups, sums)),
      "maintained view diverged from full recompute after restart")

    // one committed version per micro-batch, each a readable snapshot
    val versions = new java.io.File(statePath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong).sorted
    assert(versions.length == 4, s"versions: ${versions.mkString(",")}")
    assert(rowSet(spark.read.parquet(s"$statePath/v=${versions(1)}")) ==
      rowSet(mid))
    o.unpersist(); delta.unpersist()
  }
}
