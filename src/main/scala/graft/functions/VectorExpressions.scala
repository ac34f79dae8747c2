package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two numeric array columns.
  *
  * This is the tier-(b) custom operator of the preference order (compose
  * built-ins > custom Expression > custom plan > mapPartitions): the
  * higher-order-function formulation
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` allocates an intermediate
  * array per row and is not whole-stage-codegen'd; this expression
  * generates a tight primitive loop inside the stage's generated code —
  * the shape that matters when scoring 10⁹ embeddings.
  *
  * Accumulation is a sequential left fold in element order, bit-identical
  * to the HOF version and to DuckDB's `list_sum` over an index
  * comprehension — so oracle hash-parity is preserved.
  *
  * Null semantics: a null array yields null (nullSafeEval); elements are
  * assumed non-null (embedding vectors), mismatched lengths dot the
  * common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall { e =>
      e.dataType match {
        case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
        case _ => false
      }
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric array inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (at, bt) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(a, at, i) * get(b, bt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def getter(arr: String, t: DataType): String = t match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case DoubleType => s"$arr.getDouble($i)"
        case IntegerType => s"(double) $arr.getInt($i)"
        case LongType => s"(double) $arr.getLong($i)"
        case other => throw new IllegalStateException(s"unsupported element type $other")
      }
      s"""
        |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $acc = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $acc += ${getter(a, elemType(left))} * ${getter(b, elemType(right))};
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native squared L2 distance over two numeric array columns — the
  * [[DotProduct]] treatment for the PQ/ANN distance kernel: the HOF form
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)` is
  * interpreted per element, and the PQ encoder evaluates it M·K times
  * per vector (128 subvector distances at the default shape) — the
  * index-build hot path. Same sequential left fold in element order as
  * the HOF form and the DuckDB comprehension, so results are
  * bit-identical (spec-locked).
  *
  * Length mismatch yields NULL — same as the HOF form (`zip_with` pads
  * the shorter array with null elements, which nulls the whole fold)
  * and the DuckDB comprehension, so the bit-identical contract covers
  * ragged inputs too. Array ELEMENTS are assumed non-null (embedding
  * vectors — parquet float arrays): a null element is read as garbage
  * by design, exactly like every numeric kernel over `ArrayData`; feed
  * cleaned vectors.
  */
case class L2DistSq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null on length mismatch even when both inputs are non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "l2_dist_sq"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall { e =>
      e.dataType match {
        case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
        case _ => false
      }
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric array inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (at, bt) = (elemType(left), elemType(right))
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = get(a, at, i) - get(b, bt, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      def getter(arr: String, t: DataType): String = t match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case DoubleType => s"$arr.getDouble($i)"
        case IntegerType => s"(double) $arr.getInt($i)"
        case LongType => s"(double) $arr.getLong($i)"
        case other => throw new IllegalStateException(s"unsupported element type $other")
      }
      s"""
        |if ($a.numElements() != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  final int $n = $a.numElements();
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    final double $d = ${getter(a, elemType(left))} - ${getter(b, elemType(right))};
        |    $acc += $d * $d;
        |  }
        |  ${ev.value} = $acc;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native element-wise difference `a(i) - b(i)` of two numeric array
  * columns, as `array<double>` — the residual kernel of the IVF-PQ
  * index build ([[graft.operators.Pq.residual]]): the HOF form
  * `zip_with(a, b, (x, c) => x.cast(double) - c)` is interpreted per
  * element and the residual-index build evaluates it once per corpus
  * vector — the same interpreted-HOF class [[L2DistSq]] eliminated for
  * the distance kernel. The subtraction is the identical exact IEEE
  * double op in the identical element order, so results are
  * bit-identical to the HOF twin (spec-locked) and the q115 oracle.
  *
  * Length mismatch yields NULL (the HOF twin nulls the padded elements
  * instead — a shape this kernel's callers never produce; NULL is the
  * loud contract). Array elements are assumed non-null, as in
  * [[L2DistSq]].
  */
case class VectorSub(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // null on length mismatch even when both inputs are non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "vector_sub"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall { e =>
      e.dataType match {
        case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
        case _ => false
      }
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric array inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (at, bt) = (elemType(left), elemType(right))
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = get(a, at, i) - get(b, bt, i)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      def getter(arr: String, t: DataType): String = t match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case DoubleType => s"$arr.getDouble($i)"
        case IntegerType => s"(double) $arr.getInt($i)"
        case LongType => s"(double) $arr.getLong($i)"
        case other => throw new IllegalStateException(s"unsupported element type $other")
      }
      s"""
        |if ($a.numElements() != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  final int $n = $a.numElements();
        |  final double[] $out = new double[$n];
        |  for (int $i = 0; $i < $n; $i++) {
        |    $out[$i] = ${getter(a, elemType(left))} - ${getter(b, elemType(right))};
        |  }
        |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column API for [[DotProduct]]. */
  def dotNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column API for [[L2DistSq]]. */
  def d2Native(a: Column, b: Column): Column =
    GraftSqlBridge.column(L2DistSq(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column API for [[VectorSub]]. */
  def subNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(VectorSub(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Register the vector kernels for SQL use — same codegen'd
    * expressions the Column API binds, so a SQL-surface user never
    * falls back to interpreted `aggregate`/`zip_with` HOFs for these.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    def binary(name: String, make: (org.apache.spark.sql.catalyst.expressions.Expression,
        org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      GraftSqlBridge.registerFunction(spark, name, { exprs =>
        require(exprs.length == 2,
          s"$name takes exactly 2 array arguments, got ${exprs.length}")
        make(exprs(0), exprs(1))
      })
    binary("dot_product", DotProduct(_, _))
    binary("l2_dist_sq", L2DistSq(_, _))
    binary("vector_sub", VectorSub(_, _))
  }
}
