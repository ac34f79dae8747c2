package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Pre-digested member table for one coarse cell: member ids, centroid
  * components flattened row-major, and each member's precomputed
  * `sqrt(norm2)` — so the per-row loop is one fused dot + divide per
  * member with zero allocation.
  */
final case class CellMembers(cids: Array[Long], flat: Array[Double],
    norms: Array[Double], dim: Int)

object CellMembers {
  /** Norms use the same sequential double fold as [[DotProduct]], so the
    * cosine below is bit-identical to `TextOps.cosine` over the same
    * vectors. */
  def build(ms: Seq[(Long, Seq[Double])]): CellMembers = {
    val n = ms.length
    val dim = if (n == 0) 0 else ms.head._2.length
    val cids = new Array[Long](n)
    val flat = new Array[Double](n * dim)
    val norms = new Array[Double](n)
    var i = 0
    ms.foreach { case (cid, cv) =>
      cids(i) = cid
      var s = 0.0
      var j = 0
      cv.foreach { c =>
        flat(i * dim + j) = c; s += c * c; j += 1
      }
      norms(i) = math.sqrt(s)
      i += 1
    }
    CellMembers(cids, flat, norms, dim)
  }
}

/** The per-cell argmax `struct<cos,ncid,cid>` of
  * [[graft.operators.Ivf.assignTwoLevel]]'s level 2, with the member
  * index riding a REAL `Broadcast` instead of the plan.
  *
  * The `typedLit` encoding made the expression TREE size k-independent,
  * but a literal's PAYLOAD still serializes into the stage's task binary
  * — O(k·dim) bytes shipped per stage (the k=1000 stress already logs a
  * 1 MB task-binary warning; the dial table's k≈10⁶–10⁷ would put
  * 0.5–13 GB there). This expression serializes only the broadcast
  * HANDLE; executors torrent-fetch the member table once and every task
  * on the executor shares the in-memory copy — the same lifecycle as a
  * broadcast-hash-join relation, without the join or its output
  * re-aggregation (the operator stays one map-side projection).
  *
  * Semantics are bit-identical to the literal forms (spec-locked):
  * cosine = `round(dot / (sqrt(norm2 a) · sqrt(norm2 b)), 6)` with the
  * exact same fold order and HALF_UP rounding as `TextOps.cosine`, ties
  * broken toward the lowest cid via the struct's negated-cid field. A
  * ccid with no member cell yields null (the probed set only ever holds
  * live cells). `CodegenFallback` is deliberate: the hot loop is the
  * tight JVM scan below, and the surrounding `transform`/`array_max`
  * are interpreted HOFs anyway.
  */
case class CellArgmaxBroadcast(members: Broadcast[Map[Long, CellMembers]],
    left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cell_argmax_broadcast"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(FloatType | DoubleType | IntegerType | LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint ccid, numeric array), got $l / $r")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("ncid", LongType, nullable = false),
    StructField("cid", LongType, nullable = false)))

  override def nullable: Boolean = true

  private lazy val elemT = VecKernel.elemType(right)
  private lazy val elemNullable = VecKernel.elemNullable(right)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  override def nullSafeEval(ccidAny: Any, embAny: Any): Any = {
    val cell = members.value.getOrElse(ccidAny.asInstanceOf[Long], null)
    if (cell == null) return null
    val a = embAny.asInstanceOf[ArrayData]
    val n = a.numElements()
    // norm2(emb), same sequential fold as DotProduct(a, a)
    var na = 0.0
    var j = 0
    while (j < n) {
      if (elemNullable && a.isNullAt(j)) return null
      val v = VecKernel.get(a, elemT, j)
      na += v * v
      j += 1
    }
    val sqrtNa = math.sqrt(na)
    val dim = cell.dim
    var bestCos = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var i = 0
    while (i < cell.cids.length) {
      var d = 0.0
      var p = i * dim
      j = 0
      while (j < n) {
        d += VecKernel.get(a, elemT, j) * cell.flat(p)
        p += 1; j += 1
      }
      val cos = round6(d / (sqrtNa * cell.norms(i)))
      val cid = cell.cids(i)
      if (cos > bestCos || (cos == bestCos && cid < bestCid)) {
        bestCos = cos; bestCid = cid
      }
      i += 1
    }
    InternalRow(bestCos, -bestCid, bestCid)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BroadcastArgmax {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** Column API for [[CellArgmaxBroadcast]]. */
  def cellArgmax(members: Broadcast[Map[Long, CellMembers]],
      ccid: Column, emb: Column): Column =
    GraftSqlBridge.column(CellArgmaxBroadcast(members,
      GraftSqlBridge.expression(ccid), GraftSqlBridge.expression(emb)))
}
