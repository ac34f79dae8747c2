package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** [[graft.operators.TextOps]] primitives in isolation. The dedup/ANN
  * query packs exercise them end-to-end against the DuckDB oracle; this
  * spec pins edge-case behavior the oracled paths filter away.
  */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shinglesK is total: fewer than k tokens yields empty, not garbage (ADVICE r3)") {
    // Without the guard, sequence(1, size-(k-1)) counts DOWN for short
    // docs and element_at with indices <= 0 reads from the array END —
    // silently corrupting signatures for any caller that forgets the
    // size(ws) >= k filter.
    val got = Seq("a b c d", "a b", "a", "")
      .toDF("text")
      .select(TextOps.shinglesK(TextOps.tokens(col("text")), 3).as("sh"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == List("a b c", "b c d"))
    assert(got(1) == Nil && got(2) == Nil && got(3) == Nil)
  }

  test("shinglesK at exactly k tokens yields the single full shingle") {
    val got = Seq("x y z").toDF("text")
      .select(TextOps.shinglesK(TextOps.tokens(col("text")), 3))
      .collect().head.getSeq[String](0)
    assert(got == Seq("x y z"))
  }
}
