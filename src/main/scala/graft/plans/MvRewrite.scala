package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Cast, EqualTo, Expression, IsNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.IntegerType

import graft.core.OracleArith

/** Transparent query rewrite over maintained aggregate views — the read
  * half of the IVM story (Goldstein & Larson, "Optimizing queries using
  * materialized views", SIGMOD 2001, restricted to the distributive
  * count/sum views [[graft.operators.IncrementalAgg]] maintains): a
  * registered base table's grouped count/sum aggregate is answered from
  * the group-sized view instead of the base scan, INCLUDING coarser
  * grouping (any subset of the view's group columns re-aggregates the
  * view — counts sum, sums sum), which is what makes one maintained view
  * serve a whole rollup family. At 100 TB the rewrite turns a
  * full-fact-scan aggregate into a scan of thousands of rows, and
  * because [[graft.streaming.IvmStream]] keeps the view bit-identical to
  * a from-scratch recompute, the rewrite is exact, not approximate —
  * the q247 gate's oracle aggregates the BASE table in DuckDB while the
  * Spark plan never touches it (PlanShapeSpec pins the plan shape).
  *
  * Matching is deliberately conservative — it fires only when
  * equivalence is provable from the registration:
  *   - the aggregate's child is the registered base relation (bare or
  *     under a column-pruning Project),
  *   - every grouping expression is a plain column ⊆ the view's group
  *     columns,
  *   - every aggregate is `count(1)`, `sum(CAST(c AS DECIMAL(18,2)))`
  *     for a registered sum column c — the exact expression
  *     [[IncrementalAgg.state]] materialized ([[OracleArith.dec2]]), so
  *     "sum of the view's sums" is the same DECIMAL arithmetic, just
  *     reassociated (exact: decimal addition is associative) — or
  *     `min(c)`/`max(c)` for a registered min/max column (min of group
  *     minima is exact under any roll-up; maintenance of those columns
  *     is the q240 dirty-group patch, but READING them is distributive).
  * Anything else (filters, other functions, non-registered columns)
  * leaves the plan untouched. Output attribute ids are preserved, so
  * parent operators are unaffected.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** A registered view: base-table path → (analyzed view relation,
    * group columns, raw-sum-column → view-sum-column).
    */
  final case class MvDef(viewPlan: LogicalPlan, groupCols: Seq[String],
      sums: Map[String, String],
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty)

  private val defs = new TrieMap[String, MvDef]()

  private def normalize(p: String): String = new Path(p).toUri.getPath

  /** Register a maintained view for `basePath`. The view parquet at
    * `viewPath` must hold [[graft.operators.IncrementalAgg.state]]'s
    * layout: `groupCols`, `n`, and the named sum columns. Re-registering
    * (e.g. after a refresh rewrote the parquet) replaces the entry and
    * re-lists the view's files.
    */
  def register(spark: SparkSession, basePath: String, viewPath: String,
      groupCols: Seq[String], sums: Map[String, String],
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty): Unit =
    defs.put(normalize(basePath),
      MvDef(spark.read.parquet(viewPath).queryExecution.analyzed,
        groupCols, sums, mins, maxs))

  /** A registered JOIN view (the read half of q242/q244's maintained
    * join views): (left path, right path) → equi-key column-name pairs,
    * analyzed view relation, group columns, sums.
    */
  final case class JoinMvDef(keys: Set[(String, String)],
      viewPlan: LogicalPlan, groupCols: Seq[String],
      sums: Map[String, String])

  private val joinDefs = new TrieMap[(String, String), JoinMvDef]()

  /** Register a maintained view of `leftPath ⋈ rightPath` on the given
    * (leftCol, rightCol) equi-key pairs. Matching is orientation-exact:
    * the query's join must have the registered left table on the left.
    */
  def registerJoin(spark: SparkSession, leftPath: String, rightPath: String,
      keys: Seq[(String, String)], viewPath: String,
      groupCols: Seq[String], sums: Map[String, String]): Unit =
    joinDefs.put((normalize(leftPath), normalize(rightPath)),
      JoinMvDef(keys.toSet,
        spark.read.parquet(viewPath).queryExecution.analyzed,
        groupCols, sums))

  def deregister(basePath: String): Unit = defs.remove(normalize(basePath))
  def deregisterJoin(leftPath: String, rightPath: String): Unit =
    joinDefs.remove((normalize(leftPath), normalize(rightPath)))
  def clear(): Unit = { defs.clear(); joinDefs.clear() }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (defs.isEmpty && joinDefs.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(grouping, aggExprs, child, _) =>
        rewrite(grouping, aggExprs, child)
          .orElse(rewriteJoin(grouping, aggExprs, child))
          .getOrElse(agg)
    }

  /** Strip pure column-pruning Projects (the shapes USING-joins and the
    * column pruner insert).
    */
  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      stripProjects(child)
    case other => other
  }

  private def pathOf(lr: LogicalRelation): Option[String] =
    lr.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
        Some(normalize(fs.location.rootPaths.head.toString))
      case _ => None
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** The base relation under pruning Projects and IsNotNull-only
    * Filters, returning the null-filtered column names. The optimizer
    * derives `IsNotNull(key)` under every inner equi-join; stripping it
    * is sound exactly when the filtered columns are the join keys (the
    * inner-join view never contained null-key rows to begin with).
    */
  private def baseUnderNullFilters(
      p: LogicalPlan): Option[(LogicalRelation, Set[String])] = p match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      baseUnderNullFilters(child)
    case Filter(cond, child) =>
      val names = conjuncts(cond).map {
        case IsNotNull(a: AttributeReference) => a.name
        case _ => return None
      }
      baseUnderNullFilters(child).map { case (lr, n) => (lr, n ++ names) }
    case lr: LogicalRelation => Some((lr, Set.empty))
    case _ => None
  }

  /** Aggregate over an inner equi-join of two registered relations →
    * aggregate over the maintained join view, when the join keys are
    * exactly the registered pairs and every output is provable as in
    * [[rewrite]].
    */
  private def rewriteJoin(grouping: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] =
    stripProjects(child) match {
      case j @ Join(l, r, Inner, Some(cond), _) =>
        for {
          (lRel, lFiltered) <- baseUnderNullFilters(l)
          (rRel, rFiltered) <- baseUnderNullFilters(r)
          lPath <- pathOf(lRel)
          rPath <- pathOf(rRel)
          d <- joinDefs.get((lPath, rPath))
          pairs <- Some(conjuncts(cond).map {
            case EqualTo(a: AttributeReference, b: AttributeReference)
                if j.left.outputSet.contains(a) &&
                  j.right.outputSet.contains(b) => (a.name, b.name)
            case EqualTo(b: AttributeReference, a: AttributeReference)
                if j.left.outputSet.contains(a) &&
                  j.right.outputSet.contains(b) => (a.name, b.name)
            case _ => return None
          }.toSet) if pairs == d.keys &&
            lFiltered.subsetOf(d.keys.map(_._1)) &&
            rFiltered.subsetOf(d.keys.map(_._2))
          rewritten <- buildViewAggregate(grouping, aggExprs,
            MvDef(d.viewPlan, d.groupCols, d.sums))
        } yield rewritten
      case _ => None
    }

  /** The base relation under an optional column-pruning Project. */
  private def baseRelation(plan: LogicalPlan): Option[LogicalRelation] =
    plan match {
      case lr: LogicalRelation => Some(lr)
      case Project(ps, lr: LogicalRelation)
          if ps.forall(_.isInstanceOf[AttributeReference]) => Some(lr)
      case _ => None
    }

  private def registeredFor(lr: LogicalRelation): Option[MvDef] =
    lr.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
        defs.get(normalize(fs.location.rootPaths.head.toString))
      case _ => None
    }

  /** The raw column under [[OracleArith.dec2]]'s cast, when the
    * expression is exactly that cast.
    */
  private def dec2Col(e: Expression): Option[String] = e match {
    case Cast(a: AttributeReference, OracleArith.Dec, _, _) => Some(a.name)
    case _ => None
  }

  /** Rewrite one aggregate-output expression against the view: a
    * provable AggregateExpression (count(1) → sum(n); sum(dec2(c)) →
    * sum(view_sum) cast back to the original type), possibly under a
    * stack of casts (a final `.cast("double")` projection gets collapsed
    * INTO the aggregate by CollapseProject — the cast is preserved over
    * the rewritten aggregate).
    */
  private def rewriteExpr(e: Expression, d: MvDef,
      viewAttr: Map[String, AttributeReference]): Option[Expression] =
    e match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(1, IntegerType))) =>
            Some(AggregateExpression(Sum(viewAttr("n")),
              Complete, isDistinct = false))
          case s: Sum =>
            for {
              raw <- dec2Col(s.child)
              viewSum <- d.sums.get(raw)
            } yield Cast(AggregateExpression(Sum(viewAttr(viewSum)),
              Complete, isDistinct = false), ae.dataType)
          // min-of-minima / max-of-maxima are exact under roll-up — the
          // non-invertible aggregates IncrementalAgg maintains by
          // dirty-group patch (q240) still READ distributively
          case Min(a: AttributeReference) if d.mins.contains(a.name) =>
            Some(AggregateExpression(Min(viewAttr(d.mins(a.name))),
              Complete, isDistinct = false))
          case Max(a: AttributeReference) if d.maxs.contains(a.name) =>
            Some(AggregateExpression(Max(viewAttr(d.maxs(a.name))),
              Complete, isDistinct = false))
          case _ => None
        }
      case c @ Cast(inner, _, _, _) =>
        rewriteExpr(inner, d, viewAttr)
          .map(r => c.withNewChildren(Seq(r)))
      case _ => None
    }

  private def rewrite(grouping: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] =
    for {
      lr <- baseRelation(child)
      d <- registeredFor(lr)
      rewritten <- buildViewAggregate(grouping, aggExprs, d)
    } yield rewritten

  /** The shared replacement constructor: grouping ⊆ the view's group
    * columns, every output provable, exprIds pinned to the original's.
    */
  private def buildViewAggregate(grouping: Seq[Expression],
      aggExprs: Seq[NamedExpression], d: MvDef): Option[LogicalPlan] = {
    for {
      groupNames <- Some(grouping.map {
        case a: AttributeReference => a.name
        case _ => return None
      }) if groupNames.forall(d.groupCols.contains)
      viewAttr = d.viewPlan.output
        .collect { case a: AttributeReference => a.name -> a }.toMap
      newAggs <- Some(aggExprs.map {
        case a: AttributeReference if groupNames.contains(a.name) =>
          Alias(viewAttr(a.name), a.name)(exprId = a.exprId)
        case al @ Alias(e, name) =>
          rewriteExpr(e, d, viewAttr) match {
            case Some(r) => Alias(r, name)(exprId = al.exprId)
            case None => return None
          }
        case _ => return None
      })
    } yield Aggregate(groupNames.map(viewAttr), newAggs, d.viewPlan, None)
  }
}
