package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AcsMath

/** Property checks over the MOE algebra (SURVEY §5 test plan): generated
  * input tables, properties asserted columnwise against closed forms.
  */
class AcsPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq("a", "am", "b", "bm", "c", "cm")
    .map(StructField(_, DoubleType, nullable = false)))

  /** Deterministically generated random frame (seeded — reproducible). */
  private def genDf(n: Int): DataFrame = {
    val pos = Gen.choose(0.5, 1e6)
    val margin = Gen.choose(0.0, 1e4)
    val row = for {
      a <- pos; am <- margin; b <- pos; bm <- margin; c <- pos; cm <- margin
    } yield Row(a, am, b, bm, c, cm)
    val rows = (0 until n).flatMap(i =>
      row.apply(Gen.Parameters.default, Seed(42L + i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
  }

  private lazy val df = genDf(300)

  test("sum_m margin is permutation-invariant and dominates each component") {
    val p1 = AcsMath.sumM(Seq((col("a"), col("am")), (col("b"), col("bm")), (col("c"), col("cm"))))
    val p2 = AcsMath.sumM(Seq((col("c"), col("cm")), (col("a"), col("am")), (col("b"), col("bm"))))
    df.select(p1.m90.as("m1"), p2.m90.as("m2"),
        greatest(col("am"), col("bm"), col("cm")).as("mx"))
      .collect().foreach { r =>
        assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1e-9 * r.getDouble(0))
        assert(r.getDouble(0) >= r.getDouble(2) - 1e-12)
      }
  }

  test("sum_m nests: sumM(a,b,c) == sumM(sumM(a,b), c) (RSS associativity)") {
    val inner = AcsMath.sumM(Seq((col("a"), col("am")), (col("b"), col("bm"))))
    val nested = AcsMath.sumM(Seq((inner.est, inner.m90), (col("c"), col("cm"))))
    val flat = AcsMath.sumM(Seq((col("a"), col("am")), (col("b"), col("bm")), (col("c"), col("cm"))))
    df.select(nested.est.as("ne"), flat.est.as("fe"), nested.m90.as("nm"), flat.m90.as("fm"))
      .collect().foreach { r =>
        assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1e-9 * math.abs(r.getDouble(1)))
        assert(math.abs(r.getDouble(2) - r.getDouble(3)) <= 1e-9 * math.abs(r.getDouble(3)))
      }
  }

  test("proportion margin never NaN/negative for any inputs (the M2 guard)") {
    // includes num > den (inverted) cases by construction
    val p = AcsMath.proportion(col("a"), col("am"), col("b"), col("bm"))
    val inv = AcsMath.proportion(col("b"), col("bm"), col("a"), col("am"))
    df.select(p.m90.as("m"), inv.m90.as("mi")).collect().foreach { r =>
      assert(!r.getDouble(0).isNaN && r.getDouble(0) >= 0)
      assert(!r.getDouble(1).isNaN && r.getDouble(1) >= 0)
    }
  }

  test("guard fallback equals ratio formula exactly when radicand < 0") {
    val p = AcsMath.proportion(col("a"), col("am"), col("b"), col("bm"))
    val rat = AcsMath.ratio(col("a"), col("am"), col("b"), col("bm"))
    val radicand = col("am") * col("am") -
      (col("a") / col("b")) * (col("a") / col("b")) * col("bm") * col("bm")
    val bad = df.filter(radicand < 0)
      .select(p.m90.as("pm"), rat.m90.as("rm")).collect()
    assert(bad.nonEmpty, "generator should produce negative-radicand cases")
    bad.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("product margin symmetric in (a, b)") {
    val p1 = AcsMath.product(col("a"), col("am"), col("b"), col("bm"))
    val p2 = AcsMath.product(col("b"), col("bm"), col("a"), col("am"))
    df.select(p1.m90.as("m1"), p2.m90.as("m2")).collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1e-9 * r.getDouble(0))
    }
  }

  test("rse scales inversely with estimate, linearly with margin") {
    val out = df.select(
      AcsMath.rse(col("a"), col("am")).as("r"),
      AcsMath.rse(col("a") * 2, col("am")).as("rHalf"),
      AcsMath.rse(col("a"), col("am") * 2).as("rDouble"))
    out.collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(0) / 2) <= 1e-9 * r.getDouble(0))
      assert(math.abs(r.getDouble(2) - r.getDouble(0) * 2) <= 1e-9 * r.getDouble(0))
    }
  }

  test("grouped RSS equals closed form under repartitioning (agg determinism)") {
    val base = df.withColumn("g", (col("a") * 1000).cast("long") % 7)
    val agg1 = base.repartition(2).groupBy(col("g"))
      .agg(sum(col("a")).cast("decimal(28,6)").as("s"))
    val agg2 = base.repartition(13).groupBy(col("g"))
      .agg(sum(col("a")).cast("decimal(28,6)").as("s"))
    // decimal-rounded aggregates agree regardless of partitioning
    val m1 = agg1.collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val m2 = agg2.collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(m1.keySet == m2.keySet)
    m1.foreach { case (k, v) =>
      assert((v.doubleValue - m2(k).doubleValue).abs <= 1e-6 * v.doubleValue.abs.max(1.0))
    }
  }
}
