package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.models.{Model, ModelGraph}
import graft.sources.ParquetTableFormat

/** Incremental materialization: only rows past the high-watermark append on
  * re-runs; a full rebuild never happens once the table exists.
  */
class IncrementalModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("parallel execution yields the same results as sequential") {
    spark.sql("CREATE DATABASE IF NOT EXISTS incr_test")
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("incr_test.psrc")
    def models(suffix: String) = Seq(
      Model(s"a", s"incr_test.pa_$suffix", build = s => s.table("incr_test.psrc")),
      Model(s"b", s"incr_test.pb_$suffix", build = s => s.table("incr_test.psrc")),
      Model(s"c", s"incr_test.pc_$suffix", deps = Seq("a", "b"),
        build = s => s.table(s"incr_test.pa_$suffix")
          .unionAll(s.table(s"incr_test.pb_$suffix"))))
    val seq = new ModelGraph(models("s"), ParquetTableFormat).run(spark)
    val par = new ModelGraph(models("p"), ParquetTableFormat,
      parallelism = 4).run(spark)
    assert(seq.forall(_.ok) && par.forall(_.ok))
    assert(seq.map(r => (r.name, r.rows)).toSet == par.map(r => (r.name, r.rows)).toSet)
    assert(spark.table("incr_test.pc_p").count() == 4)
  }

  test("second run appends only rows past the high-watermark") {
    spark.sql("CREATE DATABASE IF NOT EXISTS incr_test")
    Seq((1L, 10L), (2L, 20L)).toDF("id", "seq")
      .write.mode("overwrite").saveAsTable("incr_test.src")

    def graph = new ModelGraph(Seq(Model("m", "incr_test.m_target",
      build = s => s.table("incr_test.src"),
      incrementalCol = Some("seq"))), ParquetTableFormat)

    assert(graph.run(spark).forall(_.ok))
    assert(spark.table("incr_test.m_target").count() == 2)

    // new source rows: one past the watermark (seq=30), one stale (seq=15
    // arrives late but below max=20 → NOT picked up; that's the documented
    // incremental trade-off)
    Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 15L)).toDF("id", "seq")
      .write.mode("overwrite").saveAsTable("incr_test.src")
    assert(graph.run(spark).forall(_.ok))
    val got = spark.table("incr_test.m_target")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
  }
}
