package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{Housekeeping, QueryDef, Tables}
import graft.core.OracleArith.{sqlSumDec, sumDec}

/** Storage-format and data-layout surface (SURVEY §2.1 sources/sinks,
  * extended): columnar ORC, JSON-lines interchange, bucketed tables for
  * co-located joins, and partitioned layouts for partition pruning.
  *
  * The reference delegates all layout decisions to Delta/Databricks
  * (reference scripts/ingestion.py:94-98 append+mergeSchema sink,
  * dbt_project.yml:35 `location_root` per layer); at 100 TB the layout IS
  * the optimization — bucketing removes the shuffle from every key join
  * against a conformed table, and partitioning turns full scans into
  * single-partition reads. Each gate materializes the layout on disk and
  * reads it back (the q17 write-then-read pattern), so what's verified is
  * the on-disk format semantics, not lineage.
  */
object Storage {

  /** ORC round-trip (§2.1 S1/S3 widened to a second columnar format):
    * write supplier as ORC, read it back, aggregate. Proves type fidelity
    * (bigint/int/varchar/double) through the ORC writer/reader pair.
    */
  private val orcRoundtrip = QueryDef(
    (s, dir) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_orc_supplier"
      Tables.supplier(s, dir).write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy("s_nationkey")
        .agg(
          count(lit(1)).as("n_suppliers"),
          sumDec(col("s_acctbal")).as("sum_acctbal"))
        .orderBy("s_nationkey")
    },
    s"""SELECT s_nationkey, COUNT(*) AS n_suppliers,
       |  ${sqlSumDec("s_acctbal")} AS sum_acctbal
       |FROM supplier GROUP BY 1 ORDER BY s_nationkey""".stripMargin)

  /** JSON-lines round-trip (§2.1 interchange format): write customer as
    * JSONL, read it back with an explicit schema (production ingest never
    * trusts inference), aggregate. Doubles survive because Spark writes
    * shortest-round-trip representations.
    */
  private val jsonlRoundtrip = QueryDef(
    (s, dir) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_customer"
      Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .write.mode("overwrite").json(tmp)
      s.read
        .schema("c_custkey BIGINT, c_name STRING, c_mktsegment STRING, c_acctbal DOUBLE")
        .json(tmp)
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_customers"),
          sumDec(col("c_acctbal")).as("sum_acctbal"))
        .orderBy("c_mktsegment")
    },
    s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
       |  ${sqlSumDec("c_acctbal")} AS sum_acctbal
       |FROM customer GROUP BY 1 ORDER BY c_mktsegment""".stripMargin)

  /** Bucketed co-located join (§2.5 J1 at scale): orders and lineitem
    * bucketed AND sorted by their join key into 8 buckets each — the join
    * then needs no exchange and no sort (each task zips matching buckets),
    * which at 100 TB removes the single most expensive shuffle a fact-fact
    * join has. PlanShapeSpec asserts the no-exchange plan; the oracle
    * checks the join's arithmetic.
    */
  private val bucketedJoin = QueryDef(
    (s, dir) => {
      val tag = Housekeeping.appTag(s)
      val ot = s"graft_gate_bkt_orders_$tag"
      val lt = s"graft_gate_bkt_lineitem_$tag"
      Housekeeping.dropStaleTables(s, "graft_gate_bkt_", tag)
      Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .format("parquet").saveAsTable(ot)
      Tables.lineitem(s, dir).select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .format("parquet").saveAsTable(lt)
      s.table(ot)
        .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          sumDec(col("l_quantity")).as("sum_qty"),
          sumDec(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },
    s"""SELECT o_orderpriority, COUNT(*) AS n_items,
       |  ${sqlSumDec("l_quantity")} AS sum_qty,
       |  ${sqlSumDec("l_extendedprice")} AS sum_price
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)

  /** Partition-pruned scan (§4 partition pruning): orders written
    * partitioned by year, then filtered on the partition column — the scan
    * must read exactly one partition directory (PlanShapeSpec asserts the
    * pruned read), which is the difference between scanning 100 TB and
    * scanning one year of it.
    */
  private val partitionPrune = QueryDef(
    (s, dir) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_part_orders"
      Tables.orders(s, dir)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("o_year") === 1997)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          sumDec(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },
    s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
       |  ${sqlSumDec("o_totalprice")} AS sum_price
       |FROM orders WHERE year(o_orderdate) = 1997
       |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)

  val defs: Map[String, QueryDef] = Map(
    "q58_orc_roundtrip" -> orcRoundtrip,
    "q59_jsonl_roundtrip" -> jsonlRoundtrip,
    "q83_bucketed_join" -> bucketedJoin,
    "q84_partition_prune" -> partitionPrune)
}
