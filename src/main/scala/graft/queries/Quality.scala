package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.quality._

/** Data-quality rule surface (SURVEY.md §2.6 Q1-Q10) exercised through the
  * graft.quality DSL over the star-schema tables, so the correctness gate
  * verifies the DSL itself, not hand-inlined predicates.
  */
object Quality {

  /** Q1/Q3/Q4/Q5 via RuleSet.failures: dbt-style stored failures — one row
    * per (rule, violating row). Single scan for all predicate rules.
    */
  private val ruleFailures = QueryDef(
    (s, dir) => {
      val rules = RuleSet("orders", Seq(
        AcceptedValues("o_orderstatus", Seq("O", "F")),
        InRange("o_totalprice", 0, 450000),
        Pattern("o_orderpriority", "^[1-3]-"),
        NotNull("o_custkey")))
      rules.failures(Tables.orders(s, dir))
        .select("rule", "o_orderkey")
        .orderBy("rule", "o_orderkey")
    },
    """SELECT rule, o_orderkey FROM (
      |  SELECT 'accepted_values_o_orderstatus' AS rule, o_orderkey FROM orders
      |    WHERE (o_orderstatus IN ('O','F')) IS NOT TRUE
      |  UNION ALL
      |  SELECT 'range_o_totalprice', o_orderkey FROM orders
      |    WHERE (o_totalprice BETWEEN 0 AND 450000) IS NOT TRUE
      |  UNION ALL
      |  SELECT 'pattern_o_orderpriority', o_orderkey FROM orders
      |    WHERE regexp_matches(o_orderpriority, '^[1-3]-') IS NOT TRUE
      |  UNION ALL
      |  SELECT 'not_null_o_custkey', o_orderkey FROM orders
      |    WHERE o_custkey IS NULL
      |) ORDER BY rule, o_orderkey""".stripMargin)

  /** Q2 unique rule: full violating rows for a non-unique key. */
  private val uniqueViolations = QueryDef(
    (s, dir) =>
      Unique(Seq("user_id")).violations(Tables.events(s, dir))
        .select("user_id", "event_id")
        .orderBy("user_id", "event_id"),
    """SELECT user_id, event_id FROM events
      |WHERE user_id IN (SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) > 1)
      |ORDER BY user_id, event_id""".stripMargin)

  /** Q10 quality report: completeness + uniqueness + validity scores in one
    * wide single-pass aggregation.
    */
  private val qualityProfile = QueryDef(
    (s, dir) =>
      QualityReport.profile(
        Tables.events(s, dir),
        completenessCols = Seq("value", "props"),
        uniquenessCols = Seq("event_id", "user_id"),
        validity = Map(
          "positive_value" -> (col("value") > 0),
          "known_type" -> col("event_type").isin("view", "click", "purchase", "signup", "error"))),
    """SELECT COUNT(*) AS n_rows,
      |  CAST(COUNT(value) AS DOUBLE) / COUNT(*) AS completeness_value,
      |  CAST(COUNT(props) AS DOUBLE) / COUNT(*) AS completeness_props,
      |  CAST(COUNT(DISTINCT event_id) AS DOUBLE) / COUNT(event_id) AS uniqueness_event_id,
      |  CAST(COUNT(DISTINCT user_id) AS DOUBLE) / COUNT(user_id) AS uniqueness_user_id,
      |  AVG(CASE WHEN event_type IN ('view','click','purchase','signup','error') THEN 1.0 ELSE 0.0 END) AS validity_known_type,
      |  AVG(CASE WHEN value > 0 THEN 1.0 ELSE 0.0 END) AS validity_positive_value
      |FROM events""".stripMargin)

  /** Q9 dataset-level thresholds with alert severities (ok/warning/critical
    * at the 90%-of-threshold boundary).
    */
  private val datasetChecks = QueryDef(
    (s, dir) =>
      QualityReport.datasetChecks(
        Tables.events(s, dir), keyCol = "event_id", nullCheckedCol = "value"),
    """SELECT COUNT(*) AS n_rows,
      |  CAST(COUNT(*) - COUNT(value) AS DOUBLE) / COUNT(*) AS null_pct,
      |  CAST(COUNT(event_id) - COUNT(DISTINCT event_id) AS DOUBLE) / COUNT(*) AS dup_pct,
      |  CASE WHEN CAST(COUNT(*) - COUNT(value) AS DOUBLE) / COUNT(*) > 0.05 THEN 'critical'
      |       WHEN CAST(COUNT(*) - COUNT(value) AS DOUBLE) / COUNT(*) >= 0.045 THEN 'warning'
      |       ELSE 'ok' END AS null_severity,
      |  CASE WHEN CAST(COUNT(event_id) - COUNT(DISTINCT event_id) AS DOUBLE) / COUNT(*) > 0.01 THEN 'critical'
      |       WHEN CAST(COUNT(event_id) - COUNT(DISTINCT event_id) AS DOUBLE) / COUNT(*) >= 0.009 THEN 'warning'
      |       ELSE 'ok' END AS dup_severity,
      |  CASE WHEN COUNT(*) < 100 THEN 'critical' ELSE 'ok' END AS row_count_severity
      |FROM events""".stripMargin)

  /** Q8 conditional business rule: open orders must be recent — violations
    * are 'O' orders dated before 1998.
    */
  private val conditionalRule = QueryDef(
    (s, dir) =>
      Conditional("open_orders_recent",
        col("o_orderstatus") === "O",
        col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
        .violations(Tables.orders(s, dir))
        .select("o_orderkey", "o_orderstatus", "o_orderdate")
        .orderBy("o_orderkey"),
    """SELECT o_orderkey, o_orderstatus, o_orderdate FROM orders
      |WHERE o_orderstatus = 'O' AND (o_orderdate >= TIMESTAMP '1998-01-01') IS NOT TRUE
      |ORDER BY o_orderkey""".stripMargin)

  /** q178: k-anonymity / l-diversity audit over the customer table —
    * (nation × market segment) as the quasi-identifier, account balance as
    * the sensitive attribute. One map-side-combining groupBy; flags are
    * post-aggregate predicates (Privacy.audit).
    */
  private val kAnonymity = QueryDef(
    (s, dir) =>
      graft.operators.Privacy.audit(Tables.customer(s, dir),
        Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 10, l = 5)
        .orderBy("c_nationkey", "c_mktsegment"),
    """SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_n,
      |  COUNT(DISTINCT c_acctbal) AS distinct_sensitive,
      |  COUNT(*) >= 10 AS k_anonymous,
      |  COUNT(DISTINCT c_acctbal) >= 5 AS l_diverse
      |FROM customer GROUP BY c_nationkey, c_mktsegment
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin)

  /** q180: the one-row disclosure-risk headline over the same audit —
    * achieved k (smallest group) and the row mass below each criterion.
    */
  private val privacyReport = QueryDef(
    (s, dir) =>
      graft.operators.Privacy.riskReport(Tables.customer(s, dir),
        Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 10, l = 5),
    """SELECT CAST(SUM(group_n) AS BIGINT) AS n_rows,
      |  COUNT(*) AS n_groups,
      |  MIN(group_n) AS achieved_k,
      |  CAST(SUM(CASE WHEN NOT k_anonymous THEN group_n ELSE 0 END) AS BIGINT)
      |    AS rows_below_k,
      |  CAST(SUM(CASE WHEN NOT l_diverse THEN group_n ELSE 0 END) AS BIGINT)
      |    AS rows_below_l
      |FROM (
      |  SELECT COUNT(*) AS group_n,
      |    COUNT(*) >= 10 AS k_anonymous,
      |    COUNT(DISTINCT c_acctbal) >= 5 AS l_diverse
      |  FROM customer GROUP BY c_nationkey, c_mktsegment)""".stripMargin)

  /** q217: sequential cleaning-recipe attrition (FilterCascade.attrition)
    * over documents — nonempty → length band → has an English stopword →
    * lang = 'en', each stage seeing only the previous stage's survivors.
    * One aggregate pass (prefix-conjunction CASE sums), order-sensitive by
    * construction; the oracle replays the same prefix conjunctions.
    */
  private val filterAttrition = QueryDef(
    (s, dir) =>
      FilterCascade.attrition(Tables.documents(s, dir), Seq(
        "nonempty" -> (length(trim(col("text"))) > 0),
        "length_band" -> col("n_chars").between(100, 450),
        "has_stopword" -> array_contains(
          graft.functions.TextFunctions.hashAlignedTokens(col("text")), "the"),
        "lang_en" -> (col("lang") === "en")))
        .orderBy("stage"),
    """WITH a AS (SELECT COUNT(*) AS n0,
      |  SUM(CASE WHEN COALESCE(length(trim(text)) > 0, false)
      |      THEN 1 ELSE 0 END) AS k0,
      |  SUM(CASE WHEN COALESCE(length(trim(text)) > 0, false)
      |       AND COALESCE(n_chars BETWEEN 100 AND 450, false)
      |      THEN 1 ELSE 0 END) AS k1,
      |  SUM(CASE WHEN COALESCE(length(trim(text)) > 0, false)
      |       AND COALESCE(n_chars BETWEEN 100 AND 450, false)
      |       AND COALESCE(list_contains(string_split(trim(text), ' '), 'the'), false)
      |      THEN 1 ELSE 0 END) AS k2,
      |  SUM(CASE WHEN COALESCE(length(trim(text)) > 0, false)
      |       AND COALESCE(n_chars BETWEEN 100 AND 450, false)
      |       AND COALESCE(list_contains(string_split(trim(text), ' '), 'the'), false)
      |       AND COALESCE(lang = 'en', false)
      |      THEN 1 ELSE 0 END) AS k3
      |  FROM documents),
      |st AS (
      |  SELECT 0 AS stage, 'nonempty' AS stage_name, n0 AS entering, k0 AS kept, n0 FROM a
      |  UNION ALL SELECT 1, 'length_band', k0, k1, n0 FROM a
      |  UNION ALL SELECT 2, 'has_stopword', k1, k2, n0 FROM a
      |  UNION ALL SELECT 3, 'lang_en', k2, k3, n0 FROM a)
      |SELECT CAST(stage AS INT) AS stage, stage_name,
      |  CAST(entering AS BIGINT) AS entering, CAST(kept AS BIGINT) AS kept,
      |  CAST(entering - kept AS BIGINT) AS dropped,
      |  CAST(kept AS DOUBLE) / CAST(NULLIF(entering, 0) AS DOUBLE) AS keep_rate,
      |  CAST(kept AS DOUBLE) / CAST(NULLIF(n0, 0) AS DOUBLE) AS cum_keep_rate
      |FROM st ORDER BY stage""".stripMargin)

  val defs: Map[String, QueryDef] = Map(
    "q217_filter_attrition" -> filterAttrition,
    "q20_rule_failures" -> ruleFailures,
    "q21_unique_violations" -> uniqueViolations,
    "q22_quality_profile" -> qualityProfile,
    "q23_dataset_checks" -> datasetChecks,
    "q24_conditional_rule" -> conditionalRule,
    "q178_k_anonymity" -> kAnonymity,
    "q180_privacy_report" -> privacyReport)
}
