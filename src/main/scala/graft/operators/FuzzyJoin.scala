package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) self-join — the entity-resolution primitive
  * for "same thing, slightly different spelling" matching (product names,
  * addresses, author strings).
  *
  * Scale design: never all-pairs. Candidates are generated only within
  * equi-blocks (`blockCols` — a domain key like brand/type/size), so the
  * shuffle is one hash partition on the block key and the quadratic term is
  * bounded per block. Two cheap pre-verifiers run before the DP kernel:
  * a length-band predicate (|len a − len b| > maxDist can never match —
  * prunes without computing anything) and Spark's bounded `levenshtein(l, r,
  * threshold)`, whose DP early-exits once the distance provably exceeds the
  * bound (O(len × maxDist) instead of O(len²)). Skewed blocks are AQE's
  * skew-join problem, same as any key join; a production caller with one
  * giant block adds a secondary blocking column (e.g. first character).
  */
object FuzzyJoin {

  /** Pairs (id_a < id_b) within the same `blockCols` block whose `strCol`
    * edit distance is in [minDist, maxDist]. `minDist = 1` excludes exact
    * duplicates (those belong to exact dedup, one hash-groupBy away);
    * `minDist = 0` includes them.
    */
  def blockedPairs(df: DataFrame, idCol: String, strCol: String,
      blockCols: Seq[String], maxDist: Int, minDist: Int = 1): DataFrame = {
    require(maxDist >= 0 && minDist >= 0 && minDist <= maxDist,
      s"need 0 <= minDist <= maxDist, got [$minDist, $maxDist]")
    val a = df.select(col(idCol).as("id_a") +: col(strCol).as("s_a") +:
      blockCols.map(col): _*)
    val b = df.select(col(idCol).as("id_b") +: col(strCol).as("s_b") +:
      blockCols.map(col): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      // length band: a guaranteed-miss never reaches the DP kernel
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      // bounded levenshtein: early-exits at maxDist+1, returns -1 beyond
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= minDist && col("dist") <= maxDist)
  }
}
