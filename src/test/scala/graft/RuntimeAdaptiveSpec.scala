package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime/adaptive execution credentials: the engine's queries benefit
  * from Spark's runtime row-level filtering and AQE re-planning without
  * any code on our side fighting them. Both tests isolate their conf
  * changes in `newSession()` so the shared TestSpark session (and its
  * plan-locked specs) are untouched.
  */
class RuntimeAdaptiveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("selective fact join gets a runtime bloom filter injected (100 TB regime emulated)") {
    // At 100 TB the fact scan exceeds the application-side threshold and
    // a selective dim/fact filter triggers injection; emulate by lowering
    // the threshold (and disabling auto-broadcast so the join shuffles,
    // as it would at scale).
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = s.read.parquet(s"$dir/lineitem.parquet")
    val o = s.read.parquet(s"$dir/orders.parquet").filter(col("o_totalprice") > 400000)
    val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).count()
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"no runtime bloom filter injected on the fact scan:\n$p")
  }

  test("AQE coalesces over-provisioned shuffle partitions at runtime") {
    // 32 shuffle partitions (the cluster-sized default) over tiny data:
    // AQE must merge post-shuffle partitions instead of running 32
    // near-empty reducers — the knob that keeps small stages cheap while
    // spark.sql.shuffle.partitions stays sized for the big ones.
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "32")
    val agg = s.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
    agg.collect()
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("AQEShuffleRead") && p.contains("coalesced"),
      s"AQE did not coalesce the shuffle read:\n$p")
  }
}
