package graft.plans

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Analyzer resolution rule giving SQL users the census pairing
  * convention ([[graft.CensusFrame.selectCensus]]): a `with_m90(col)`
  * select item expands, pre-resolution, into `col, col_m90` — selecting
  * an estimate auto-carries its margin, exactly like the DataFrame API
  * (ref `test/test_basic.py:176-195` for the convention).
  *
  * This is the `injectResolutionRule` leg of `SparkSessionExtensions`
  * (strategies and functions are injected alongside in
  * [[graft.GraftExtensions]]); the rewrite happens during analysis, so
  * downstream optimization (column pruning to the scan) sees only plain
  * attribute references.
  */
object MarginExpansionRule extends Rule[LogicalPlan] {

  private def marker(e: Expression): Option[Expression] = e match {
    case UnresolvedAlias(inner, _) => marker(inner)
    case Alias(inner, _) => marker(inner)
    case f: UnresolvedFunction
        if f.nameParts.map(_.toLowerCase) == Seq("with_m90") &&
          f.arguments.length == 1 =>
      Some(f.arguments.head)
    case _ => None
  }

  private def expand(arg: Expression): Seq[NamedExpression] = arg match {
    case a: UnresolvedAttribute =>
      Seq(a, UnresolvedAttribute(a.nameParts.init :+ (a.nameParts.last + "_m90")))
    case a: AttributeReference =>
      Seq(a, UnresolvedAttribute(Seq(a.name + "_m90")))
    case other => throw new IllegalArgumentException(
      s"with_m90 takes a single column reference, got: $other")
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case Project(list, child) if list.exists(e => marker(e).isDefined) =>
      Project(list.flatMap(e => marker(e).map(expand).getOrElse(Seq(e))), child)
  }
}
