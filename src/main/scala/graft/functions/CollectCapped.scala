package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `collect_list` with a HARD buffer bound, specialized to a struct of
  * two longs — the posting-list collector of the inverted-index
  * containment dedup (q127).
  *
  * Why it exists: a plain `collect_list` materializes a group's ENTIRE
  * value list in one aggregation buffer before any df-cap filter can
  * drop it — so a hot boilerplate shingle (df in the millions at corpus
  * scale: the very stop-shingles the cap exists to cull) would buffer an
  * unbounded document list in one reducer. This aggregate keeps AT MOST
  * `maxElems` elements per group — in the partial buffers, across
  * merges, and in the final value — so memory per group is
  * O(maxElems), independent of the group's true cardinality.
  *
  * Truncation is invisible to the query's result: callers set
  * `maxElems = cap + 1` and drop lists with `size > cap`. A group
  * truncates only once it already holds `cap + 1` elements, and merging
  * never shrinks a buffer, so a truncated group's final size is exactly
  * `cap + 1` — always `> cap`, always dropped; an un-truncated group
  * (true df ≤ cap + 1 in every aggregation path) carries its complete
  * list. WHICH `cap + 1` elements a truncated (hence dropped) group
  * holds is partitioning-dependent; kept groups are complete and, after
  * the caller's `sort_array`, deterministic.
  *
  * Scale shape: same partial/merge contract as every
  * `TypedImperativeAggregate` (map-side partials, fixed-bound buffers
  * through the exchange, element-append merge).
  */
case class CollectPairsCapped(
    child: Expression,
    maxElems: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]]
  with UnaryLike[Expression] {

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "collect_pairs_capped"

  override def checkInputDataTypes(): TypeCheckResult =
    if (maxElems <= 0)
      TypeCheckResult.TypeCheckFailure("maxElems must be positive")
    else child.dataType match {
      case StructType(fields)
          if fields.length == 2 && fields.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires struct<long,long> input, got $other")
    }

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, Long)],
      input: InternalRow): ArrayBuffer[(Long, Long)] = {
    if (buf.length < maxElems) {
      val v = child.eval(input)
      if (v != null) {
        val r = v.asInstanceOf[InternalRow]
        buf += ((r.getLong(0), r.getLong(1)))
      }
    }
    buf
  }

  override def merge(a: ArrayBuffer[(Long, Long)],
      b: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    var i = 0
    while (a.length < maxElems && i < b.length) { a += b(i); i += 1 }
    a
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(buf.map { case (x, y) =>
      InternalRow(x, y)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (x, y) => bb.putLong(x); bb.putLong(y) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, Long)](n)
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CollectPairsCapped =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CollectPairsCapped =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CollectPairsCapped =
    copy(child = newChild)
}

object CollectCapped {
  import org.apache.spark.sql.GraftSqlBridge

  /** Aggregate Column collecting at most `maxElems` `struct<long,long>`
    * values per group (see [[CollectPairsCapped]] for the truncation
    * contract).
    */
  def pairs(col: Column, maxElems: Int): Column =
    GraftSqlBridge.column(
      CollectPairsCapped(GraftSqlBridge.expression(col), maxElems)
        .toAggregateExpression())
}
