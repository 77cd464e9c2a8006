package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SchemaDrift

/** Schema drift classification and the append-compatibility contract. */
class SchemaDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val contract = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("amount", DoubleType, nullable = true),
    StructField("status", StringType, nullable = true)))

  test("added / removed / type_changed / nullability_relaxed are all caught") {
    val observed = StructType(Seq(
      StructField("id", LongType, nullable = true),      // relaxed
      StructField("amount", StringType, nullable = true), // type changed
      StructField("batch_tag", StringType, nullable = true))) // added; status removed
    val drifts = SchemaDrift.compare(contract, observed)
      .map(d => (d.column, d.change)).toSet
    assert(drifts == Set(
      ("id", "nullability_relaxed"),
      ("amount", "type_changed"),
      ("status", "removed"),
      ("batch_tag", "added")))
  }

  test("identical schemas drift nowhere and are append-compatible") {
    assert(SchemaDrift.compare(contract, contract).isEmpty)
    assert(SchemaDrift.appendCompatible(contract, contract))
  }

  test("append compatibility: additions pass, anything else fails") {
    val withExtra = StructType(contract.fields :+
      StructField("note", StringType, nullable = true))
    assert(SchemaDrift.appendCompatible(contract, withExtra))
    val withNarrow = StructType(contract.fields.map {
      case f if f.name == "amount" => f.copy(dataType = FloatType)
      case f => f
    })
    assert(!SchemaDrift.appendCompatible(contract, withNarrow))
  }

  test("report surfaces as a DataFrame alongside quality reports") {
    val observed = StructType(contract.fields.filterNot(_.name == "status"))
    val rows = SchemaDrift.report(spark, contract, observed).collect()
    assert(rows.length == 1 && rows.head.getString(1) == "removed")
  }

  test("a real inferSchema read drifts exactly where inference disagrees") {
    // the reference's CSV drops use inferSchema — ints arrive as INT, the
    // contract says BIGINT: that must surface as type_changed, not explode
    // at write time
    val inferred = StructType(Seq(
      StructField("id", IntegerType, nullable = true),
      StructField("amount", DoubleType, nullable = true),
      StructField("status", StringType, nullable = true)))
    val drifts = SchemaDrift.compare(contract, inferred)
    assert(drifts.exists(d => d.column == "id" && d.change == "type_changed"))
  }
}
