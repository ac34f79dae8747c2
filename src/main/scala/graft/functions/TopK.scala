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

/** Per-group bounded top-k: the `k` SMALLEST `struct<double,long>`
  * values under lexicographic (score, id) order, returned as an
  * ascending array.
  *
  * Why it exists: the stock way to take "top k per group" is a
  * `row_number()` window + filter, which shuffles EVERY candidate row
  * to the group's partition before any are discarded — for q138's
  * hard-negative mining that is all ~nprobe·n²/k scored pairs. As a
  * `TypedImperativeAggregate` the selection instead runs map-side:
  * each task's partial buffer already holds at most `k` rows per
  * group, so the exchange moves ≤ k rows per (group, task) — the same
  * partial/merge contract that makes `TakeOrdered` scale, but per
  * group. Buffer memory is O(k) per group by construction.
  *
  * Determinism: min-k under a TOTAL order is a pure function of the
  * group's value multiset — independent of row order, partitioning,
  * and merge shape (ties inside the struct are broken by the id
  * field; equal (score, id) duplicates are kept multiset-style). The
  * DuckDB oracle replays it as `ROW_NUMBER() OVER (ORDER BY score,
  * id) <= k`.
  *
  * Callers negate a descending score ("top k by cosine" ⇒ store
  * `-cosine`), same convention as [[graft.operators.Ivf]]'s ranked
  * cells.
  */
case class TopKScored(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with UnaryLike[Expression] {

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "topk_scored"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure("k must be positive")
    else child.dataType match {
      case StructType(fields)
          if fields.length == 2 && fields(0).dataType == DoubleType &&
            fields(1).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires struct<double,long> input, got $other")
    }

  private implicit val ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  /** Sort ascending and keep the k smallest. Buffers are allowed to
    * overfill to 2k between trims so the amortized per-row cost stays
    * O(log k)-ish rather than a sort per insert.
    */
  private def trim(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (buf.length > k) {
      val kept = buf.sorted.take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Long)],
      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      buf += ((r.getDouble(0), r.getLong(1)))
      if (buf.length >= 2 * k) trim(buf)
    }
    buf
  }

  override def merge(a: ArrayBuffer[(Double, Long)],
      b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    a ++= b
    if (a.length > k) trim(a)
    a
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.sorted.take(k).map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    trim(buf)
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKScored =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKScored =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TopKScored =
    copy(child = newChild)
}

object TopK {
  import org.apache.spark.sql.GraftSqlBridge

  /** Aggregate Column: ascending array of the group's `k` smallest
    * `struct<double,long>` values (see [[TopKScored]]).
    */
  def scored(col: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKScored(GraftSqlBridge.expression(col), k).toAggregateExpression())
}
