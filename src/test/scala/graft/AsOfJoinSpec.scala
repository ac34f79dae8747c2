package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf
import graft.queries.Tables

/** The custom as-of join operator: semantics vs the window-composition
  * formulation, plan shape, and API validation.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def events = Tables(spark, dir, "events")

  private def asofResult = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("su"), col("ts").as("s_ts"))
    AsOf.join(purchases, signups, "user_id", "ts", "su", "s_ts")
  }

  test("matches the window-composition as-of (q27 semantics)") {
    val viaOperator = asofResult
      .select(col("event_id"), col("s_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val viaWindow = events
      .withColumn("last_signup", max(when(col("event_type") === "signup", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("last_signup"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toMap

    assert(viaOperator.keySet == viaWindow.keySet)
    assert(viaOperator == viaWindow)
  }

  test("left-outer: purchases with no prior signup get null") {
    val rows = asofResult.collect()
    assert(rows.exists(_.isNullAt(rows.head.fieldIndex("s_ts"))),
      "expected at least one unmatched purchase at sf0.001")
  }

  test("physical plan is AsOfJoinExec with clustered+sorted children") {
    val plan = asofResult.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the "Exec" suffix in plan strings
    assert(plan.contains("AsOfJoin "), s"custom exec missing:\n$plan")
    assert(plan.contains("Sort [user_id"), s"child sort missing:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(user_id"),
      s"child clustering missing:\n$plan")
  }

  test("API validation: bad column, wrong type, name clash") {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("su"), col("ts").as("s_ts"))
    intercept[IllegalArgumentException](
      AsOf.join(purchases, signups, "nope", "ts", "su", "s_ts"))
    intercept[IllegalArgumentException](
      AsOf.join(purchases.withColumn("k", lit("x")), signups, "k", "ts", "su", "s_ts"))
    intercept[IllegalArgumentException](
      AsOf.join(purchases, signups.withColumnRenamed("su", "user_id"),
        "user_id", "ts", "user_id", "s_ts"))
  }
}
