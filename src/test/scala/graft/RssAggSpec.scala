package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RssAgg

/** The typed RSS Aggregator: matches the expression form, partial-merge
  * correct under repartitioning, SQL-registrable.
  */
class RssAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("typed RSS equals expression RSS on make_df margins") {
    import spark.implicits._
    val df = TestSpark.makeDf()
    val viaExpr = df.agg(sqrt(sum(col("col0_m90") * col("col0_m90"))))
      .head().getDouble(0)
    val viaTyped = df.select(col("col0_m90")).as[Double]
      .select(RssAgg.column).head()
    assert(math.abs(viaTyped - viaExpr) < 1e-12)
  }

  test("registered udaf 'rss' works in grouped SQL and under repartitioning") {
    RssAgg.register(spark)
    TestSpark.makeDf().repartition(7).createOrReplaceTempView("mdf")
    val rows = spark.sql(
      "SELECT group, rss(col1_m90) AS m FROM mdf GROUP BY group ORDER BY group")
      .collect()
    val expected = TestSpark.makeDf().collect()
      .groupBy(_.getString(1))
      .map { case (g, rs) => g -> math.sqrt(rs.map(r => math.pow(r.getDouble(5), 2)).sum) }
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - expected(r.getString(0))) < 1e-9)
    }
  }
}
