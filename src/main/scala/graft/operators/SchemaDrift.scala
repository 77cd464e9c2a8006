package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema drift report — the metadata-level sibling of [[SnapshotDiff]]:
  * given the declared contract of a feed and the schema a new batch
  * actually arrived with, classify every column as added / removed /
  * type_changed / nullability_relaxed / unchanged. Full-dump sources
  * (the reference's CSV drops with inferSchema + mergeSchema-on-append)
  * drift silently; this is the check that turns a surprise
  * `mergeSchema` widening into an explicit, alertable event before
  * ingest writes anything.
  *
  * Pure metadata — no data is scanned; the report is driver-computed from
  * two StructTypes and surfaced as a (tiny) DataFrame so it can be stored
  * next to the quality reports.
  */
object SchemaDrift {

  final case class Drift(column: String, change: String,
      expected: String, observed: String)

  /** Column-level drift entries, `unchanged` rows omitted. */
  def compare(expected: StructType, observed: StructType): Seq[Drift] = {
    val exp = expected.fields.map(f => f.name -> f).toMap
    val obs = observed.fields.map(f => f.name -> f).toMap
    val added = observed.fields.filterNot(f => exp.contains(f.name))
      .map(f => Drift(f.name, "added", "", f.dataType.simpleString))
    val removed = expected.fields.filterNot(f => obs.contains(f.name))
      .map(f => Drift(f.name, "removed", f.dataType.simpleString, ""))
    val changed = expected.fields.flatMap { ef =>
      obs.get(ef.name).flatMap { of =>
        if (ef.dataType != of.dataType)
          Some(Drift(ef.name, "type_changed",
            ef.dataType.simpleString, of.dataType.simpleString))
        else if (!ef.nullable && of.nullable)
          Some(Drift(ef.name, "nullability_relaxed",
            "not null", "nullable"))
        else None
      }
    }
    (added ++ removed ++ changed).toIndexedSeq.sortBy(d => (d.column, d.change))
  }

  /** The same report as a DataFrame (column, change, expected, observed). */
  def report(spark: SparkSession, expected: StructType,
      observed: StructType): DataFrame = {
    import spark.implicits._
    compare(expected, observed).toDF("column", "change", "expected", "observed")
  }

  /** True iff a batch with `observed` schema can append under the contract
    * without widening it: no removed columns, no type changes, no
    * nullability relaxation (added columns are allowed — that is what
    * mergeSchema is for, but it should be a conscious decision upstream).
    */
  def appendCompatible(expected: StructType, observed: StructType): Boolean =
    compare(expected, observed).forall(_.change == "added")
}
