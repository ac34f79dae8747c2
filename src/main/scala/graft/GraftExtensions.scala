package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.DotProduct

/** Session-extension entry point so deployments get graft's custom
  * expressions in every session without imperative registration:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  * or
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *
  * (SURVEY §2.8 / the prompt's tier-(c) registration mechanism; the
  * functions themselves stay tier-(b) expressions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      { exprs =>
        require(exprs.length == 2,
          s"dot_product takes exactly 2 array arguments, got ${exprs.length}")
        DotProduct(exprs.head, exprs(1))
      }))
  }
}
