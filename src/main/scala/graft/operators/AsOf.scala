package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}

/** Public API for the custom as-of join operator (graft.plans.AsOfJoin):
  * for each left row, the latest right row with the same key whose time
  * is ≤ the left time; left-outer.
  *
  * {{{
  * AsOf.join(trades, quotes, leftKey = "symbol_id", leftTime = "t",
  *           rightKey = "q_symbol_id", rightTime = "q_t")
  * }}}
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    GraftSqlBridge.addStrategy(spark, AsOfJoinStrategy)

    val lPlan = GraftSqlBridge.analyzedPlan(left)
    val rPlan = GraftSqlBridge.analyzedPlan(right)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String, side: String) =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"$side column '$name' not found in [${plan.output.map(_.name).mkString(", ")}]"))

    val (lk, lt) = (attr(lPlan, leftKey, "left"), attr(lPlan, leftTime, "left"))
    val (rk, rt) = (attr(rPlan, rightKey, "right"), attr(rPlan, rightTime, "right"))

    def checkTypes(key: org.apache.spark.sql.catalyst.expressions.Attribute,
        time: org.apache.spark.sql.catalyst.expressions.Attribute): Unit = {
      require(key.dataType == LongType,
        s"as-of key must be LONG, '${key.name}' is ${key.dataType}")
      require(time.dataType == TimestampType || time.dataType == LongType,
        s"as-of time must be TIMESTAMP or LONG, '${time.name}' is ${time.dataType}")
    }
    checkTypes(lk, lt); checkTypes(rk, rt)

    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty,
      s"as-of join requires disjoint column names; rename right-side columns: $dup")

    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt))
  }
}
