package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CountMin, CountMinSketchMd5}
import graft.operators.TextOps
import graft.queries.Tables

/** Count-min sketch TypedImperativeAggregate: CMS invariants (estimate
  * never underestimates; exact when no bucket collisions), partial-merge
  * safety under any partitioning, and the SQL registration path.
  */
class CmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def tokens = Tables(spark, dir, "documents")
    .select(explode(TextOps.tokens(col("text"))).as("token"))

  test("estimate >= exact count for every token (CMS never underestimates)") {
    val sketch = tokens.agg(CountMin.sketch(col("token")).as("sk"))
    val est = (0 until 4).map { j =>
      element_at(col("sk"),
        ((TextOps.seededHash(j, col("token")) % 64) + lit(j * 64) + 1).cast("int"))
    }.reduce(least(_, _))
    val rows = tokens.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sketch))
      .select(col("token"), col("n"), est.as("cms"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"CMS underestimated '${r.getString(0)}': ${r.getLong(2)} < ${r.getLong(1)}"))
  }

  test("partial merge is partitioning-invariant (map-side combine safe)") {
    def sk(parts: Int): Seq[Long] =
      tokens.repartition(parts).agg(CountMin.sketch(col("token")))
        .head().getSeq[Long](0)
    val one = sk(1)
    assert(sk(7) == one && sk(3) == one)
    assert(one.sum > 0 && one.length == 4 * 64)
  }

  test("wide sketch with no collisions is exact") {
    import spark.implicits._
    val small = Seq("a", "a", "b", "c", "c", "c").toDF("t")
    // width 4096 over 3 distinct keys: collisions vanishingly unlikely
    val sk = small.agg(CountMin.sketch(col("t"), depth = 2, width = 4096).as("sk"))
    val est = (0 until 2).map { j =>
      element_at(col("sk"),
        ((TextOps.seededHash(j, col("t")) % 4096) + lit(j * 4096) + 1).cast("int"))
    }.reduce(least(_, _))
    val got = small.distinct().crossJoin(sk).select(col("t"), est.as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L, "c" -> 3L))
  }

  test("cms_md5 registers for SQL and matches the Column API") {
    CountMin.register(spark)
    tokens.createOrReplaceTempView("toks")
    val viaSql = spark.sql("SELECT cms_md5(token) FROM toks").head().getSeq[Long](0)
    val viaCol = tokens.agg(CountMin.sketch(col("token"))).head().getSeq[Long](0)
    assert(viaSql == viaCol)
  }

  test("jvm hash matches the md5 convention used by the oracle") {
    // the seededHash Column expression and the imperative JVM hash must
    // agree — they are two implementations of the same formula
    val s = "verify"
    val fromCol = spark.range(1)
      .select(TextOps.seededHash(2, lit(s))).head().getLong(0)
    assert(CountMinSketchMd5.hash(2, s) == fromCol)
  }
}
