package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CollectPairsCapped

/** Direct binary round-trip of the capped collector's
  * serialize/deserialize path — the representation partial buffers take
  * through a shuffle exchange between executor JVMs. The cluster smoke
  * exercises it end-to-end; this pins the encoding itself (round-7
  * ADVICE: the path existed for multi-process exchange but had never
  * been unit-tested in isolation).
  */
class CollectCappedSpec extends AnyFunSuite {

  private val pairType = StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false)))
  private val agg = CollectPairsCapped(BoundReference(0, pairType, nullable = true), maxElems = 5)

  private def roundTrip(buf: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] =
    agg.deserialize(agg.serialize(buf))

  test("serialize/deserialize round-trips empty, partial, and at-cap buffers") {
    assert(roundTrip(ArrayBuffer.empty) == ArrayBuffer.empty)

    val partial = ArrayBuffer((1L, 2L), (3L, 4L))
    assert(roundTrip(partial) == partial)

    // at the cap (= cap + 1 in the caller's contract: a truncated group)
    val full = ArrayBuffer.tabulate(5)(i => (i.toLong, -i.toLong))
    assert(roundTrip(full) == full)

    // extreme values survive the fixed-width encoding
    val edges = ArrayBuffer((Long.MinValue, Long.MaxValue), (0L, -1L))
    assert(roundTrip(edges) == edges)
  }

  test("merge of deserialized partials still respects the cap") {
    // the exchange shape: two map-side partials arrive as bytes, are
    // deserialized, then merged — the merged buffer must never exceed
    // maxElems no matter the partials' combined size
    val p1 = roundTrip(ArrayBuffer.tabulate(3)(i => (i.toLong, i.toLong)))
    val p2 = roundTrip(ArrayBuffer.tabulate(4)(i => (100L + i, 100L + i)))
    val merged = agg.merge(p1, p2)
    assert(merged.length == 5, "merge must stop at maxElems")
    assert(merged.take(3) == ArrayBuffer((0L, 0L), (1L, 1L), (2L, 2L)))
    assert(merged.drop(3) == ArrayBuffer((100L, 100L), (101L, 101L)))
  }
}
