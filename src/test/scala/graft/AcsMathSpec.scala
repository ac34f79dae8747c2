package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AcsMath

/** ACS Handbook worked examples + closed-form checks, porting the golden
  * constants of `/root/reference/test/test_basic.py` (see BASELINE.md).
  */
class AcsMathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def csv(name: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(TestSpark.resource(s"acs/$name"))

  private def firstDouble(df: DataFrame, col: org.apache.spark.sql.Column): Double =
    df.select(col).head().getDouble(0)

  test("sum_m matches Handbook Table 1 (test_basic.py:139-145)") {
    val df = csv("agg.csv")
    val p = AcsMath.sumM(Seq(
      (col("a"), col("a_m90")), (col("b"), col("b_m90")), (col("c"), col("c_m90"))))
    val Row(est: Double, m90: Double) = df.select(p.est, p.m90).head()
    assert(math.round(est) == 89008L)
    assert(math.round(m90) == 4289L)
  }

  test("proportion matches Handbook Table 2 (test_basic.py:147-153)") {
    val df = csv("prop.csv")
    val p = AcsMath.proportion(col("a"), col("a_m90"), col("b"), col("b_m90"))
    val Row(est: Double, m90: Double) = df.select(p.est, p.m90).head()
    assert(BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble == 0.1461)
    assert(BigDecimal(m90).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble == 0.0311)
  }

  test("ratio matches Handbook Table 3 (test_basic.py:155-163)") {
    val df = csv("ratio.csv")
    val p = AcsMath.ratio(col("a"), col("a_m90"), col("b"), col("b_m90"))
    val Row(est: Double, m90: Double) = df.select(p.est, p.m90).head()
    assert(math.abs(est - 0.719565) < 5e-7)
    assert(math.abs(m90 - 0.213545) < 5e-5)
  }

  test("product matches Handbook Table 4 (test_basic.py:165-173)") {
    val df = csv("product.csv")
    val p = AcsMath.product(col("a"), col("a_m90"), col("b"), col("b_m90"))
    val Row(est: Double, m90: Double) = df.select(p.est, p.m90).head()
    assert(math.round(est) == 6784L)
    assert(math.round(m90) == 1405L)
  }

  test("closed-form sum_m / rse on make_df (test_basic.py:97-107)") {
    import CensusFrame.CensusOps
    val cf = TestSpark.makeDf().census
    val s1 = cf.sumM("col0", "col1")
    val out = cf.withPairs("s1" -> s1).addRse("s1").df
    // s1 = 3r; s1_m90 = (7r/6)*sqrt(5); rse constant 52.8621 (BASELINE.md)
    val rseMean = firstDouble(out, avg(col("s1_rse")))
    val m90Mean = firstDouble(out, avg(col("s1_m90")))
    assert(math.abs(rseMean - 52.8621) < 5e-5)
    assert(math.abs(m90Mean - 14.3481) < 5e-5)
  }

  test("closed-form ratio mean 0.5 on make_df (test_basic.py:103)") {
    import CensusFrame.CensusOps
    val cf = TestSpark.makeDf().census
    val out = cf.withPairs("r" -> cf.ratio("col0", "col1")).df
    assert(math.abs(firstDouble(out, avg(col("r"))) - 0.5) < 1e-12)
  }

  test("closed-form proportion formula on make_df (test_basic.py:109-113)") {
    import CensusFrame.CensusOps
    val cf = TestSpark.makeDf().census
    val out = cf.withPairs("p" -> cf.proportion("col0", "col1")).df
      .select(col("col0"), col("col0_m90"), col("col1"), col("col1_m90"),
        col("p"), col("p_m90"))
    out.collect().foreach { r =>
      val (n, nm, d, dm, p, pm) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))
      assert(math.abs(p - n / d) < 1e-12)
      val expected = math.sqrt(nm * nm - (n / d) * (n / d) * dm * dm) / d
      assert(math.abs(pm - expected) < 1e-12)
    }
  }

  test("proportion negative radicand falls back to ratio, no NaN (test_basic.py:120-133)") {
    import CensusFrame.CensusOps
    val cf = TestSpark.makeDf().census
    // swapped num/den: col1/col0 is NOT a subset → radicand goes negative
    val out = cf.withPairs("p" -> cf.proportion("col1", "col0")).df
    val rows = out.select(col("p"), col("p_m90"), col("col1"), col("col1_m90"),
      col("col0"), col("col0_m90")).collect()
    rows.foreach { r =>
      assert(!r.getDouble(1).isNaN, "m90 must never be NaN on negative radicand")
      // fallback is the non-subset ratio formula
      val (n, nm, d, dm) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      val ratioM = math.sqrt(nm * nm + (n / d) * (n / d) * dm * dm) / d
      assert(math.abs(r.getDouble(1) - ratioM) < 1e-12)
    }
  }

  test("grouped sum combines margins as root-sum-of-squares (test_basic.py:197-207)") {
    import CensusFrame.CensusOps
    val cf = TestSpark.makeDf().census
    val grouped = cf.fillNaMargins().groupBySum("group").df
    val expect = TestSpark.makeDf().collect()
      .groupBy(_.getString(1))
      .map { case (g, rs) =>
        g -> (rs.map(_.getDouble(2)).sum,
          math.sqrt(rs.map(r => math.pow(r.getDouble(3), 2)).sum))
      }
    grouped.select(col("group"), col("col0"), col("col0_m90")).collect().foreach { r =>
      val (e, m) = expect(r.getString(0))
      assert(math.abs(r.getDouble(1) - e) < 1e-9)
      assert(math.abs(r.getDouble(2) - m) < 1e-9)
    }
  }

  test("grouped mean scales RSS margin by count (SURVEY A2)") {
    import CensusFrame.CensusOps
    val cf = TestSpark.makeDf().census
    val grouped = cf.groupByMean("group").df
    val expect = TestSpark.makeDf().collect()
      .groupBy(_.getString(1))
      .map { case (g, rs) =>
        g -> (rs.map(_.getDouble(2)).sum / rs.length,
          math.sqrt(rs.map(r => math.pow(r.getDouble(3), 2)).sum) / rs.length)
      }
    grouped.select(col("group"), col("col0"), col("col0_m90")).collect().foreach { r =>
      val (e, m) = expect(r.getString(0))
      assert(math.abs(r.getDouble(1) - e) < 1e-9)
      assert(math.abs(r.getDouble(2) - m) < 1e-9)
    }
  }
}
