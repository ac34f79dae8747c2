package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables co-locate join keys so repeated fact-fact joins run
  * with ZERO shuffle (SURVEY §2.6 mapping: "bucketing for co-located
  * joins") — the pre-partitioning strategy for a 100 TB star schema where
  * lineitem⋈orders happens in every query.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans with no shuffle exchange") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      spark.read.parquet(s"$dir/orders.parquet")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      val shuffles = plan.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("BroadcastExchange"))
      // the join itself must be exchange-free (bucket co-location);
      // only the final small aggregation shuffles
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      val joinSection = plan.split("Join").head
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"join should reuse bucketing:\n$plan")
      assert(shuffles <= 1, s"expected only the post-join agg exchange:\n$plan")
      // and the result is right
      val total = joined.agg(sum(col("q"))).head().getDouble(0)
      val expected = spark.read.parquet(s"$dir/lineitem.parquet")
        .agg(sum(col("l_quantity"))).head().getDouble(0)
      assert(total == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
