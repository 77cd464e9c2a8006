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

  test("join view maintained from one multi-table CDC stream across restart") {
    val jGroups = Seq("seg", "o_orderstatus")
    val c = Tables.customer(spark, SparkTestSession.sfDir)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
      .cache()
    val o = Tables.orders(spark, SparkTestSession.sfDir)
      .select(col("o_custkey").as("k"), col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice")).cache()

    // the q244 delta, tagged with a side column on one superset schema
    val moved = c.filter(col("k") % 47 === 0)
    val cDelta = moved.withColumn("op", lit("delete"))
      .unionByName(moved.withColumn("seg", lit("MOVED"))
        .withColumn("op", lit("insert")))
    val repOld = o.filter(col("o_orderkey") % 107 === 0 &&
        col("o_orderkey") % 109 =!= 0)
      .withColumn("op", lit("delete"))
    val oDelta = o.filter(col("o_orderkey") % 109 === 0)
      .withColumn("op", lit("delete"))
      .unionByName(repOld)
      .unionByName(repOld.withColumn("op", lit("insert"))
        .withColumn("o_totalprice", col("o_totalprice") + 125.0))
      .unionByName(o.filter(col("o_orderkey") % 113 === 0)
        .withColumn("op", lit("insert")))
    def cdcRows(i: Int): DataFrame =
      cDelta.filter(col("k") % 3 === i)
        .select(lit("r").as("side"), col("op"), col("k"), col("seg"),
          lit(null).cast("string").as("o_orderstatus"),
          lit(null).cast("double").as("o_totalprice"))
        .unionByName(
          oDelta.filter(col("o_orderkey") % 3 === i)
            .select(lit("s").as("side"), col("op"), col("k"),
              lit(null).cast("string").as("seg"),
              col("o_orderstatus"), col("o_totalprice")))

    val srcDir = java.nio.file.Files.createTempDirectory("graft_jivm_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_jivm_ckpt")
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_jivm_state").toString
    def stage(df: DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_jivm_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.move(
        java.nio.file.Files.list(tmp)
          .filter(_.toString.endsWith(".parquet")).findFirst.get,
        java.nio.file.Paths.get(s"$srcDir/$name"))
    }
    def run(): Unit = {
      val cdc = spark.readStream
        .schema("side STRING, op STRING, k BIGINT, seg STRING, " +
          "o_orderstatus STRING, o_totalprice DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.toString)
      val q = IvmStream.maintainJoinAggStream(cdc, c, o.drop("o_orderkey"),
        statePath, ckpt.toString, "side", "op", Seq("k"),
        rCols = Seq("k", "seg"),
        sCols = Seq("k", "o_orderstatus", "o_totalprice"),
        jGroups, sums).start()
      q.processAllAvailable(); q.stop()
    }
    stage(cdcRows(0), "0.parquet"); stage(cdcRows(1), "1.parquet")
    run()
    stage(cdcRows(2), "2.parquet")
    run() // restart: logs + view versions continue on the checkpoint

    def jRowSet(df: DataFrame): Set[(String, String, Long, BigDecimal)] =
      df.select(col("seg"), col("o_orderstatus"), col("n"),
        col("sum_price").cast("decimal(18,2)"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          BigDecimal(r.getDecimal(3)))).toSet

    // final maintained view == from-scratch recompute of post-delta R ⋈ S
    val cAfter = c.filter(col("k") % 47 =!= 0)
      .unionByName(moved.withColumn("seg", lit("MOVED")))
    val oAfter = o.filter(col("o_orderkey") % 109 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 107 === 0, col("o_totalprice") + 125.0)
          .otherwise(col("o_totalprice")))
      .unionByName(o.filter(col("o_orderkey") % 113 === 0))
    val truth = IncrementalAgg.state(
      cAfter.join(oAfter.drop("o_orderkey"), Seq("k")), jGroups, sums)
    assert(jRowSet(IvmStream.latestState(spark, s"$statePath/view").get) ==
      jRowSet(truth),
      "maintained join view diverged from full recompute")

    // both logs hold one committed partition per micro-batch
    assert(IvmStream.listLogBatches(spark, s"$statePath/rlog",
      Long.MaxValue).length == 3)
    assert(IvmStream.listLogBatches(spark, s"$statePath/slog",
      Long.MaxValue).length == 3)
    c.unpersist(); o.unpersist()
  }

  test("a versioned MV registration tracks the stream's refreshes, no re-register") {
    import graft.plans.MvRewrite
    // the rewrite rule rides the engine's user-rule batch
    val tuned = graft.core.Sessions.tune(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivm_mv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivm_mv_ckpt")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_ivm_mv_src")
    Tables.orders(tuned, SparkTestSession.sfDir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.parquet(s"$dir/base")
    val base = tuned.read.parquet(s"$dir/base")
    val baseState = IncrementalAgg.state(base, groups, sums)
    val chunks = Seq(
      base.filter(col("o_orderkey") % 13 === 0)
        .withColumn("op", lit("delete")),
      base.filter(col("o_orderkey") % 17 === 0)
        .withColumn("op", lit("insert")))
      .map(_.select("op", "o_orderpriority", "o_totalprice"))
    // the fold twin's expected rows, computed BEFORE registration: the
    // twin re-aggregates the registered base, so once the view is ahead
    // of the base snapshot the rewrite would — correctly under its
    // logical-table contract, wrongly for this twin — answer baseState
    // from the refreshed view (the registry is JVM-global by design)
    val expected = rowSet(
      IvmStream.foldRefresh(baseState, chunks, "op", groups, sums))
    // register ONCE, before any version exists
    MvRewrite.registerVersioned(s"$dir/base", s"$dir/state", groups,
      Map("o_totalprice" -> "sum_price"))
    try {
      def stage(df: DataFrame, name: String): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("graft_ivm_mv_stage")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        java.nio.file.Files.move(
          java.nio.file.Files.list(tmp)
            .filter(_.toString.endsWith(".parquet")).findFirst.get,
          java.nio.file.Paths.get(s"$srcDir/$name"))
      }
      def runStream(): Unit = {
        val deltas = tuned.readStream
          .schema("op STRING, o_orderpriority STRING, o_totalprice DOUBLE")
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir.toString)
        val q = IvmStream.maintainAggStream(deltas, baseState, s"$dir/state",
          ckpt.toString, "op", groups, sums).start()
        q.processAllAvailable(); q.stop()
      }
      def query(): DataFrame = base.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(graft.core.OracleArith.dec2(col("o_totalprice"))).as("sum_price"))
      // before any committed version: the query stays on the base scan
      assert(!query().queryExecution.executedPlan.toString.contains("/state/v="))
      stage(chunks(0), "0.parquet"); runStream()
      val p1 = query().queryExecution.executedPlan.toString
      assert(p1.contains("state/v=0"), p1.take(800))
      stage(chunks(1), "1.parquet"); runStream()
      // the SAME registration now answers from v=1 — the r9 frozen
      // registry would have kept reading v=0 until a manual re-register
      val q2 = query()
      val p2 = q2.queryExecution.executedPlan.toString
      assert(p2.contains("state/v=1") && !p2.contains("state/v=0"), p2.take(800))
      assert(rowSet(q2) == expected,
        "rewritten read diverged from the batch fold twin")
    } finally MvRewrite.deregister(s"$dir/base")
  }

  test("compaction preserves the multiset and later deltas are unchanged") {
    import spark.implicits._
    import graft.operators.IncrementalJoin
    val rBase = Seq((1L, "A"), (2L, "B"), (2L, "B"), (3L, "C"))
      .toDF("k", "seg")
    val rLog = Seq( // delete one of the duplicate 2s, delete 3 (both rows
      // bit-identical to base), insert a second 1 (net 2) and a new 4
      (-1, 2L, "B"), (-1, 3L, "C"), (1, 1L, "A"), (1, 4L, "D"))
      .toDF("__m", "k", "seg")
    val signed = rBase.withColumn("__m", lit(1)).unionByName(rLog)
    val compacted = IvmStream.compactSigned(signed, "__m")
    val got = compacted.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got == Map((1L, "A") -> 2, (2L, "B") -> 1, (4L, "D") -> 1))

    // the algebra cannot tell (base', empty) from (base, log): the next
    // chunk's ΔV is identical against either representation
    val sOld = Seq((1L, "O", 10.0), (2L, "O", 5.0), (4L, "O", 7.0))
      .toDF("k", "status", "price").withColumn("__m", lit(1))
    val rD = Seq(("delete", 4L, "D")).toDF("op", "k", "seg")
    val sD = Seq(("insert", 1L, "F", 3.0)).toDF("op", "k", "status", "price")
    def dv(rOld: org.apache.spark.sql.DataFrame) =
      IncrementalJoin.deltaJoinStateSigned(rOld, rD, sOld, sD, "__m",
        "op", Seq("k"), Seq("seg", "status"), Seq("total" -> "price"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDecimal(3).toPlainString)).toSet
    assert(dv(signed) == dv(compacted.withColumn("__m", lit(1))))
  }

  test("vacuum drops old committed view versions, never the newest") {
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_ivm_vacuum").toString
    import spark.implicits._
    (0L to 3L).foreach(v => Seq((v, 1L)).toDF("ver", "n")
      .write.parquet(s"$statePath/v=$v"))
    val dropped = IvmStream.vacuumView(spark, statePath, keepLast = 2)
    assert(dropped == Seq(0L, 1L))
    assert(IvmStream.latestState(spark, statePath).get
      .select("ver").head.getLong(0) == 3L)
    // idempotent: nothing more to drop
    assert(IvmStream.vacuumView(spark, statePath, keepLast = 2).isEmpty)
  }
}
