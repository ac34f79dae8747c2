package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale mechanics that don't show in the oracle queries: partitioned
  * writes with partition pruning, and HLL accuracy (SURVEY §4, A5).
  */
class PartitioningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("partitioned write + partition pruning at the scan") {
    val out = java.nio.file.Files.createTempDirectory("li-part").toString
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    val back = spark.read.parquet(out).filter(col("l_returnflag") === "R")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"expected partition filter in:\n$plan")
    val expected = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_returnflag") === "R").count()
    assert(back.count() == expected)
  }

  test("approx_count_distinct within 5% of exact (q29 companion)") {
    val r = spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .head()
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("repartition by key co-locates groups (shuffle-once pattern)") {
    // repartition on the join/agg key, then both group-by and self-join
    // reuse the partitioning without further exchanges
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .repartition(4, col("l_orderkey"))
    val agg = li.groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
    val plan = agg.queryExecution.executedPlan.toString
    // only the explicit repartition exchange; groupBy adds no second one
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1,
      s"expected a single exchange in:\n$plan")
  }
}
