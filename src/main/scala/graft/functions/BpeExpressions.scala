package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Bpe

/** Native per-document BPE token accounting: one pass over the text
  * computing `(n_words, n_bpe_tokens)` with the trained merge table
  * applied per word — the projection q114 runs over every document.
  *
  * Why an Expression (tier (b) of the custom-operator ladder, same
  * rationale as [[MinHashSig]]): the compositional form routes every
  * WORD through an interpreted `transform` lambda (charSyms → chained
  * replaces → split → size) plus an interpreted `aggregate` fold —
  * CodegenFallback HOFs, so per document that is O(words) interpreted
  * expression-tree walks inside the scan stage. This kernel does the
  * identical string math in a tight JVM loop behind a single static
  * call, which keeps the projection inside whole-stage codegen. Unlike
  * the `mapPartitions` tier ([[graft.operators.Bpe.tokenCounts]], tier
  * (d), reserved for 32k-merge vocabularies that cannot ride as an
  * expression tree) it stays a composable `Column` — no encoder hop,
  * no loss of column pruning around it.
  *
  * BIT-PARITY CONTRACT (spec-locked): delegates to the same host twins
  * the `mapPartitions` tier uses — [[graft.operators.Bpe.charSymsHost]]
  * and [[graft.operators.Bpe.applyMergesHost]], whose padded
  * leftmost-non-overlapping `String.replace` semantics are proven
  * bit-identical to the `replace`-chain Column path (BpeSpec) — over
  * exactly the words `filter(split(text, " "), w -> length(w) > 0)`.
  * Null text yields a null struct, matching the HOF path's null
  * propagation through `split`/`transform`/`aggregate`.
  */
case class BpeTokenStats(child: Expression, merges: Seq[Bpe.Merge])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_bpe_tokens", LongType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "bpe_token_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    BpeTokenStats.compute(t.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mergesRef = ctx.addReferenceObj("bpeMerges", merges,
      "scala.collection.immutable.Seq")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeTokenStats.compute($c, $mergesRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenStats =
    copy(child = newChild)
}

object BpeTokenStats {
  import org.apache.spark.sql.GraftSqlBridge

  /** Struct Column `(n_words, n_bpe_tokens)` for a text column under a
    * trained merge table.
    */
  def of(text: Column, merges: Seq[Bpe.Merge]): Column =
    GraftSqlBridge.column(BpeTokenStats(GraftSqlBridge.expression(text), merges))

  /** Static kernel (codegen calls this directly). One pass: split on
    * single spaces, skip empties, per word run the host-twin merge
    * application and count the resulting symbols.
    */
  def compute(t: UTF8String, merges: Seq[Bpe.Merge]): InternalRow = {
    val parts = t.toString.split(" ")
    var n = 0L
    var toks = 0L
    var i = 0
    while (i < parts.length) {
      val w = parts(i)
      if (w.nonEmpty) {
        n += 1
        toks += Bpe.applyMergesHost(Bpe.charSymsHost(w), merges)
          .trim.split(" ").length
      }
      i += 1
    }
    InternalRow(n, toks)
  }
}
