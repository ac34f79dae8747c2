package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PairCombinations

/** The native pair generator vs the interpreted nested-transform HOF
  * composition it replaced in q127: identical pair stream, identical
  * order, nothing emitted for degenerate inputs.
  */
class PairCombinationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("emits every i<j pair in row-major order") {
    val rows = Seq(Seq(1L, 2L, 3L, 4L)).toDF("xs")
      .select(PairCombinations.of(col("xs")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("null, empty, and single-element arrays emit nothing") {
    val df = Seq(
      (1, Some(Seq.empty[Long])),
      (2, Some(Seq(42L))),
      (3, None: Option[Seq[Long]])).toDF("id", "xs")
    assert(df.select(PairCombinations.of(col("xs"))).count() == 0)
  }

  test("SQL registration drives the same generator") {
    PairCombinations.register(spark)
    Seq(Seq("x", "y", "z")).toDF("xs").createOrReplaceTempView("pc_t")
    val rows = spark.sql("SELECT a, b FROM pc_t LATERAL VIEW pair_combinations(xs) g AS a, b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("x", "y"), ("x", "z"), ("y", "z")))
  }

  test("property: pair multiset matches the Scala reference model on seeded random arrays") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // seeded → reproducible: lengths 0..40, values with collisions, ~10% null elements
    val elemGen = Gen.frequency(
      9 -> Gen.choose(0L, 9L).map(Option(_)),
      1 -> Gen.const(None: Option[Long]))
    val arrGen = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, elemGen))
    val arrays: Seq[(Long, Seq[Option[Long]])] = (0 until 80).map { i =>
      i.toLong -> arrGen.apply(Gen.Parameters.default, Seed(1234L + i)).get
    }
    val expected: Map[Long, Map[(Option[Long], Option[Long]), Int]] = arrays.map {
      case (id, xs) =>
        val pairs = for {
          i <- xs.indices; j <- (i + 1) until xs.length
        } yield (xs(i), xs(j))
        id -> pairs.groupBy(identity).view.mapValues(_.size).toMap
    }.toMap

    val actual = arrays.toDF("id", "xs")
      .select(col("id"), PairCombinations.of(col("xs")))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r =>
            (Option(r.get(1)).map(_.asInstanceOf[Long]),
             Option(r.get(2)).map(_.asInstanceOf[Long])))
          .groupBy(identity).view.mapValues(_.length).toMap
      }

    arrays.foreach { case (id, xs) =>
      val exp = expected(id)
      val act = actual.getOrElse(id, Map.empty)
      assert(act == exp, s"id=$id xs=$xs\nexpected=$exp\nactual=$act")
    }
    // sanity: the seed space actually exercised nulls and big fan-outs
    assert(arrays.exists(_._2.contains(None)))
    assert(arrays.exists(_._2.length >= 30))
  }

  test("matches the nested-transform HOF composition on the q127 struct shape") {
    // the exact shape q127 feeds it: sorted array<struct<doc_id,nsh>>
    val lists = Seq(
      Seq((10L, 3L), (20L, 5L), (30L, 2L)),
      Seq((7L, 1L), (8L, 9L)),
      Seq((1L, 1L))).zipWithIndex
      .map { case (ps, i) => (i.toLong, ps) }
      .toDF("sh", "raw")
      .select(col("sh"),
        expr("transform(raw, p -> struct(p._1 AS doc_id, p._2 AS nsh))").as("ds"))

    val native = lists.select(col("sh"), PairCombinations.of(col("ds")))
      .select(col("sh"), col("a.doc_id").as("doc_a"), col("a.nsh").as("nsh_a"),
        col("b.doc_id").as("doc_b"), col("b.nsh").as("nsh_b"))
    val hof = lists.select(col("sh"), explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))), y =>
          struct(x.getField("doc_id").as("doc_a"), x.getField("nsh").as("nsh_a"),
            y.getField("doc_id").as("doc_b"), y.getField("nsh").as("nsh_b")))))).as("p"))
      .select(col("sh"), col("p.doc_a"), col("p.nsh_a"), col("p.doc_b"), col("p.nsh_b"))

    val n: Seq[Row] = native.collect().toSeq
    val h: Seq[Row] = hof.collect().toSeq
    assert(n.nonEmpty && n == h, s"native=$n\nhof=$h")
  }
}
