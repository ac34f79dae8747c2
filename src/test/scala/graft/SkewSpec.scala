package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted two-phase aggregation: same results as the direct group-by,
  * with the partial phase spread over (key, salt).
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("saltedSum equals direct groupBy sum (exact, via decimal)") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(20,2)")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val salted = Skew.saltedSum(li, Seq("l_returnflag"),
        col("l_quantity").cast("decimal(20,2)"), "q", salts = 8,
        discriminators = Seq(col("l_orderkey"), col("l_linenumber")))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, v) =>
      assert(salted(k).compareTo(v) == 0, s"key $k: ${salted(k)} != $v")
    }
  }

  test("salted plan has two aggregation exchanges, direct has one") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val salted = Skew.saltedSum(li, Seq("l_returnflag"), col("l_quantity"), "q",
      salts = 8, discriminators = Seq(col("l_orderkey")))
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange")) == 2)
    // phase-1 shuffle is keyed by (key, salt)
    assert(plan.contains("__salt"))
  }

  test("saltedCountDistinct equals countDistinct") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val direct = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(li, Seq("l_returnflag"), col("l_partkey"), "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salt is deterministic and in range") {
    val df = spark.range(1000)
      .select(Skew.salt(16, col("id")).as("s1"), Skew.salt(16, col("id")).as("s2"))
    val rows = df.collect()
    assert(rows.forall(r => r.getInt(0) == r.getInt(1)))
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 16))
    // spreads: at least half the buckets used
    assert(rows.map(_.getInt(0)).distinct.length >= 8)
  }
}
