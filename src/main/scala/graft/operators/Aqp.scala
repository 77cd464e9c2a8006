package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.OracleArith._

/** Approximate query processing: grouped SUM estimates with CLT error bars
  * from a deterministic content-hash sample.
  *
  * At 100 TB "what is revenue by segment, roughly, NOW" should not cost a
  * full scan: a pre-materialized p% sample (here: md5 bucket of the row
  * key, the same stable draw behind Sampling.split — no RNG, so the sample
  * is identical across runs, engines, and retries) answers it at p% of the
  * cost with a quantified error. The estimator is classic survey sampling
  * (Cochran, "Sampling Techniques": mean-per-unit estimate with
  * finite-population correction): total_est = N x sample mean, and
  * SE = N x sqrt(s²/n x (1 − n/N)) with s² the sample variance, giving a
  * z-quantile confidence interval.
  *
  * Everything is reproducible to the bit: sample membership is a pure hash
  * predicate; n, N, Σv, Σv² aggregate in EXACT scale-0 decimal (integer
  * cents — see the in-method note on why scale-0 is the only decimal→
  * double conversion both engines round identically) and convert to double
  * once; the estimate/variance/CI dag is then a fixed IEEE expression
  * (sqrt is correctly rounded) a SQL oracle replays exactly. The q227 gate carries the true total and a `ci_hit` flag so
  * the frame itself shows the interval doing its job.
  *
  * Scale shape: the sample aggregate reads p% of rows (with a sample TABLE
  * this is a p%-sized scan; the gate filters inline to stay hermetic); the
  * exact-N side is a count-only aggregate. Rows with a NULL value are
  * excluded from BOTH sides (SUM semantics); groups whose sample has < 2
  * rows get NULL error bars (variance undefined), never a fabricated 0.
  */
object Aqp {

  /** Per-group estimated SUM of `valueCol` (a ≤2-decimal money column)
    * from a `samplePct`% hash sample of `keyCol`, with a ±z CI. Output:
    * (groupCols*, n_total, n_sample, total_true, total_est, ci_lo, ci_hi,
    * ci_hit).
    */
  def sampledSum(df: DataFrame, keyCol: String, valueCol: String,
      groupCols: Seq[String], samplePct: Int, z: Double = 1.96): DataFrame = {
    require(samplePct >= 1 && samplePct <= 99, s"samplePct in [1,99], got $samplePct")
    val rows = df.filter(col(valueCol).isNotNull)
    // moments in integer CENTS at decimal scale 0: a scale-4 sum of
    // squares has an unscaled value past 2^53, and DuckDB's decimal→double
    // cast rounds the unscaled value BEFORE the scale division (two
    // roundings) where Java rounds once — one ulp apart. A scale-0
    // decimal→double is a single correct rounding in both engines (the
    // q202 DECIMAL(38,0) rank-sum precedent), so every moment lands on the
    // identical double.
    val cents = (dec2(col(valueCol)) * lit(100)).cast(DecimalType(18, 0))
    val full = rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_total"), sumDec(col(valueCol)).as("total_true"))
    val samp = rows
      .filter(Sampling.hashBucket(col(keyCol), 100) < samplePct)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_sample"),
        sum(cents).cast("double").as("s1c"),
        sum((cents * cents).cast(DecimalType(38, 0))).cast("double").as("s2c"))
    val nT = col("n_total").cast("double")
    val nS = col("n_sample").cast("double")
    val meanC = col("s1c") / nS
    val estC = nT * meanC
    // clamp at 0: the E[x²]−n·mean² form can cancel to a tiny NEGATIVE
    // double for (near-)constant groups, and sqrt(neg) is NaN in Spark but
    // an error in DuckDB — the clamp keeps both engines defined and equal
    val varianceC =
      greatest((col("s2c") - nS * meanC * meanC) / (nS - lit(1.0)), lit(0.0))
    val seC = nT * sqrt(varianceC / nS * (lit(1.0) - nS / nT))
    // left join: a group the sample misses entirely still appears, with a
    // NULL estimate — absent rows must read as "no answer", not no group
    full.join(samp, groupCols, "left")
      .withColumn("n_sample", coalesce(col("n_sample"), lit(0L)))
      .withColumn("total_est", estC / lit(100.0))
      .withColumn("ci_lo",
        when(col("n_sample") >= 2, (estC - lit(z) * seC) / lit(100.0)))
      .withColumn("ci_hi",
        when(col("n_sample") >= 2, (estC + lit(z) * seC) / lit(100.0)))
      .withColumn("ci_hit",
        when(col("n_sample") >= 2,
          col("total_true") >= col("ci_lo") && col("total_true") <= col("ci_hi")))
      .drop("s1c", "s2c")
  }
}
