package graft

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TopK, TopKScored}

/** The bounded top-k aggregate behind q138's hard-negative cut: the k
  * SMALLEST (score, id) structs, map-side partial-aggregated. Pins the
  * two properties the query's determinism stands on — min-k is a pure
  * function of the value multiset (any insertion order, any merge
  * tree), and the buffer/serialized forms stay O(k) — plus DataFrame
  * equivalence against the window row_number() formulation it exists
  * to out-shuffle.
  */
class TopKSpec extends AnyFunSuite {

  private val snType = StructType(Seq(
    StructField("s", DoubleType, nullable = false),
    StructField("i", LongType, nullable = false)))
  private def agg(k: Int) =
    TopKScored(BoundReference(0, snType, nullable = true), k)

  private def evalOut(a: TopKScored,
      buf: ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] =
    a.eval(buf).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(snType).toSeq
      .map { r0 =>
        val r = r0.asInstanceOf[InternalRow]
        (r.getDouble(0), r.getLong(1))
      }

  private val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  test("min-k is insertion-order and merge-tree independent") {
    val a = agg(5)
    val vals = Seq.tabulate(40)(i => ((i * 37 % 19).toDouble / 4, i.toLong))
    val expect = vals.sorted(ord).take(5)
    val rng = new Random(7)
    for (trial <- 1 to 10) {
      val shuffled = rng.shuffle(vals)
      // random merge tree: split into 1..6 partials, update each, then
      // merge through serialize/deserialize (the exchange path)
      val parts = shuffled.grouped(rng.nextInt(12) + 4).toSeq
      val bufs = parts.map { p =>
        val b = a.createAggregationBuffer()
        p.foreach { case (s, i) => a.update(b, InternalRow(InternalRow(s, i))) }
        a.deserialize(a.serialize(b))
      }
      val merged = bufs.reduce(a.merge)
      assert(evalOut(a, merged) == expect, s"trial $trial")
    }
  }

  test("buffers and serialized partials stay O(k)") {
    val a = agg(3)
    val b = a.createAggregationBuffer()
    (1 to 1000).foreach { i =>
      a.update(b, InternalRow(InternalRow(i.toDouble, i.toLong)))
      assert(b.length < 6, "update buffer must trim below 2k")
    }
    val bytes = a.serialize(b)
    assert(bytes.length <= 4 + 3 * 16, "serialized partial must hold <= k")
    assert(evalOut(a, a.deserialize(bytes)) ==
      Seq((1.0, 1L), (2.0, 2L), (3.0, 3L)))
  }

  test("ties on score break by id; duplicates kept multiset-style") {
    val a = agg(3)
    val b = a.createAggregationBuffer()
    Seq((1.0, 9L), (1.0, 2L), (1.0, 2L), (0.5, 7L), (2.0, 1L)).foreach {
      case (s, i) => a.update(b, InternalRow(InternalRow(s, i)))
    }
    assert(evalOut(a, b) == Seq((0.5, 7L), (1.0, 2L), (1.0, 2L)))
  }

  test("DataFrame agg matches the window row_number() formulation " +
    "under different partitionings") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rng = new Random(11)
    val df = Seq.tabulate(500) { i =>
      (i % 17L, rng.nextInt(40) / 8.0, i.toLong)
    }.toDF("g", "score", "id")
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
      .select(col("g"), col("rn"), col("id"), col("score"))
    for (nPart <- Seq(1, 3, 8)) {
      val viaAgg = df.repartition(nPart)
        .select(col("g"), struct((-col("score")).as("s"), col("id").as("i")).as("sn"))
        .groupBy(col("g"))
        .agg(TopK.scored(col("sn"), 4).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), (col("pos") + 1).as("rn"),
          col("col.i").as("id"), (-col("col.s")).as("score"))
      assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty,
        s"nPart=$nPart")
    }
  }
}
