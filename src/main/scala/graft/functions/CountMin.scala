package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch over a string column as a Catalyst
  * `TypedImperativeAggregate` — the imperative-buffer rung of the custom
  * operator ladder (native codegen Expression → typed Aggregator →
  * TypedImperativeAggregate → LogicalPlan+Strategy+SparkPlan).
  *
  * Unlike Spark's built-in `count_min_sketch` (whose hash seeds are not
  * reproducible outside the JVM), the row hashes here are md5-derived with
  * the SAME convention as [[graft.operators.TextOps.seededHash]]
  * (`int(md5(j + "|" + s)[0:8], 16)`), so the whole sketch is integer
  * arithmetic any engine can replay — the DuckDB oracle rebuilds it
  * bit-for-bit (q73).
  *
  * Scale shape: partial aggregation is the whole point — every task folds
  * its rows into a local `depth × width` long array, the exchange moves
  * only those fixed-size buffers, and merge is element-wise add
  * (commutative + associative ⇒ deterministic regardless of partitioning).
  */
case class CountMinSketchMd5(
    child: Expression,
    depth: Int = 4,
    width: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_md5"

  override def checkInputDataTypes(): TypeCheckResult =
    if (depth <= 0 || width <= 0)
      TypeCheckResult.TypeCheckFailure("depth and width must be positive")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var j = 0
      while (j < depth) {
        buf(j * width + (CountMinSketchMd5.hash(j, s) % width).toInt) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinSketchMd5 =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinSketchMd5 =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketchMd5 =
    copy(child = newChild)
}

object CountMinSketchMd5 {
  /** `int(md5(j + "|" + s)[0:8], 16)` — identical to TextOps.seededHash
    * and to the oracle's
    * `CAST(concat('0x', substr(md5(j || '|' || s), 1, 8)) AS BIGINT)`.
    */
  def hash(j: Int, s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((j.toString + "|" + s).getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }
}

object CountMin {
  import org.apache.spark.sql.GraftSqlBridge

  /** Aggregate Column building the flattened depth×width sketch. */
  def sketch(col: Column, depth: Int = 4, width: Int = 64): Column =
    GraftSqlBridge.column(
      CountMinSketchMd5(GraftSqlBridge.expression(col), depth, width)
        .toAggregateExpression())

  /** Register `cms_md5` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "cms_md5", { exprs =>
      require(exprs.nonEmpty && exprs.length <= 3,
        s"cms_md5(col[, depth, width]) got ${exprs.length} args")
      def intArg(i: Int, default: Int): Int =
        if (exprs.length > i) exprs(i).eval(null).asInstanceOf[Number].intValue else default
      CountMinSketchMd5(exprs.head, intArg(1, 4), intArg(2, 64))
    })
}
