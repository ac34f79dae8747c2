package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs at sf0.001 and produces a sane result;
  * the exact-value gate is the DuckDB oracle (tools/check_oracle.py, and
  * the driver's t2 at sf0.01).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // queries that legitimately return few/zero rows at the smallest sf
  private val mayBeEmpty = Set("q45_ngram_jaccard", "q48_ann_search")

  test("entry flagship query returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query has distinct name and every oracle has a query") {
    val names = SparkEntry.packs.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.benchQueries.toSet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.packs.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val n = q.fn(spark, dir).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }
}
