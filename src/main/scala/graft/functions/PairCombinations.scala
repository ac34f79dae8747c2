package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Row generator emitting every unordered pair `(a, b) = (elems(i),
  * elems(j)), i < j` of an array column's elements — the within-list
  * pair expansion of the inverted-index containment dedup (q127).
  *
  * Why a Generator and not array expressions: the composed form
  * `explode(flatten(transform(ds, (x,i) => transform(slice(ds, i+2, …),
  * y => struct(x, y)))))` routes every element through TWO interpreted
  * higher-order functions (`transform` is CodegenFallback, ~10µs per
  * element call) and materializes the full n·(n-1)/2 struct array per
  * row before the explode can stream it. This generator pairs the
  * elements in a tight loop and YIELDS rows lazily through
  * `GenerateExec` — no intermediate nested array, no per-element
  * lambda dispatch, memory O(n) per input row regardless of the n²/2
  * fan-out (the df-cap bounds n, but the operator shouldn't rely on
  * it).
  *
  * Emission order is row-major over (i, j), identical to the HOF
  * composition it replaces (spec-locked), so any order-sensitive
  * downstream sees the same stream. A null or <2-element array emits
  * nothing.
  */
case class PairCombinations(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "pair_combinations"

  private def arrayType: ArrayType = child.dataType.asInstanceOf[ArrayType]

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", arrayType.elementType, nullable = arrayType.containsNull),
    StructField("b", arrayType.elementType, nullable = arrayType.containsNull)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array input, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < 2) Iterator.empty
      else {
        // one materialization of the element values; the pair stream
        // itself is lazy — GenerateExec pulls row by row
        val elems = arr.toObjectArray(arrayType.elementType)
        new Iterator[InternalRow] {
          private var i = 0
          private var j = 1
          override def hasNext: Boolean = i < n - 1
          override def next(): InternalRow = {
            val row = InternalRow(elems(i), elems(j))
            j += 1
            if (j == n) { i += 1; j = i + 1 }
            row
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombinations =
    copy(child = newChild)
}

object PairCombinations {
  import org.apache.spark.sql.GraftSqlBridge

  /** Generator Column: `df.select(PairCombinations.of(col("xs")))` yields
    * two columns `a`, `b` — one row per unordered element pair.
    */
  def of(col: Column): Column =
    GraftSqlBridge.column(PairCombinations(GraftSqlBridge.expression(col)))

  /** SQL surface: `SELECT pair_combinations(xs) FROM t` (the analyzer
    * lifts the generator into a `Generate` node, like `explode`) — same
    * expression the Column API binds.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "pair_combinations", { exprs =>
      require(exprs.length == 1,
        s"pair_combinations takes exactly 1 array argument, got ${exprs.length}")
      PairCombinations(exprs.head)
    })
}
