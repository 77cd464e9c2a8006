package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Silver-layer cleansing functions (SURVEY §2.7 C1-C9) — the transformation
  * contract declared by the reference's unit tests
  * (reference tests/unit/test_ingestion.py:204-253).
  */
object Cleansing {

  /** C1+C2: trim + uppercase an id/code column ('  pol001 ' → 'POL001'). */
  def normalizeId(c: Column): Column = upper(trim(c))

  /** C3: parse a numeric string with thousands separators
    * ('1,500.50' → 1500.50) into DECIMAL(12,2).
    */
  def parseAmount(c: Column): Column =
    // try_cast: Spark 4 runs ANSI mode — malformed input must become null
    // (quarantined by rules), not a runtime error
    regexp_replace(c.cast("string"), ",", "").try_cast("decimal(12,2)")

  /** C4: normalize the three observed date formats (yyyy-MM-dd, MM/dd/yyyy,
    * yyyy/MM/dd) to DATE; unparseable input → null (quarantined by rules,
    * not crashed on — the reference's 'invalid-date' fixture).
    */
  def parseDate(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd")).cast("date"),
      try_to_timestamp(c, lit("MM/dd/yyyy")).cast("date"),
      try_to_timestamp(c, lit("yyyy/MM/dd")).cast("date"))

  /** C2 variant for enum columns: canonical uppercase domain values. */
  def normalizeEnum(c: Column): Column = upper(trim(c))
}
