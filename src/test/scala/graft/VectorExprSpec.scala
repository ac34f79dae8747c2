package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.TextOps

/** The native DotProduct expression: bit-identical to the HOF fold,
  * codegen'd, SQL-registrable, null-safe.
  */
class VectorExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def embs = spark.read.parquet(s"$dir/embeddings.parquet")

  test("native dot == HOF dot bit-for-bit on all embeddings") {
    val q = embs.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = embs.crossJoin(broadcast(q))
      .select(col("vec_id"),
        TextOps.dot(col("embedding"), col("qv")).as("native"),
        TextOps.dotHof(col("embedding"), col("qv")).as("hof"))
    val mismatches = both.filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("native d2 == HOF d2 bit-for-bit on all embeddings (the PQ encode kernel)") {
    val q = embs.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = embs.crossJoin(broadcast(q))
      .select(col("vec_id"),
        graft.operators.Pq.d2(col("embedding"), col("qv")).as("native"),
        graft.operators.Pq.d2Hof(col("embedding"), col("qv")).as("hof"))
    val mismatches = both.filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0, s"$mismatches d2 mismatches vs the HOF fold")
  }

  test("dot_product registered for SQL") {
    VectorFunctions.register(spark)
    embs.createOrReplaceTempView("emb_v")
    val n = spark.sql(
      """SELECT vec_id, dot_product(embedding, embedding) AS d
         FROM emb_v WHERE vec_id < 5""").collect()
    assert(n.length == 5 && n.forall(_.getDouble(1) > 0))
  }

  test("l2_dist_sq and vector_sub registered for SQL (same kernels as the Column API)") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      """SELECT l2_dist_sq(array(1.0D, 2.0D), array(3.0D, 0.0D)) AS d2,
                vector_sub(array(3.0D, 5.0D), array(1.0D, 2.0D)) AS sub,
                l2_dist_sq(array(1.0D, 2.0D), array(1.0D)) AS ragged""").head()
    assert(r.getDouble(0) == 8.0)
    assert(r.getSeq[Double](1) == Seq(2.0, 3.0))
    // ragged arrays null out, matching the HOF/oracle semantics
    assert(r.isNullAt(2))
    // SQL path binds the native expressions, not an interpreted fallback:
    // both must fuse into the scan's codegen stage
    embs.createOrReplaceTempView("emb_v")
    val plan = spark.sql(
      """SELECT l2_dist_sq(embedding, vector_sub(embedding, embedding)) AS d
         FROM emb_v""").queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [l2_dist_sq"),
      s"expected l2_dist_sq inside a codegen stage in:\n$plan")
  }

  test("null array yields null, ints and floats both accepted") {
    val df = spark.sql(
      """SELECT dot_product(array(1, 2, 3), array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS a,
                dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(CAST(1.0 AS DOUBLE))) AS b""")
    val r = df.head()
    assert(r.getDouble(0) == 1 * 2.0 + 2 * 3.0 + 3 * 4.0)
    assert(r.isNullAt(1))
  }

  test("stays inside whole-stage codegen") {
    // scan → project(dot) must fuse into one codegen stage (the cross-join
    // variant sits above a BroadcastNestedLoopJoin, which never codegens —
    // that's the join's property, not the expression's)
    val plan = embs
      .select(TextOps.dot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [dot_product"),
      s"expected the dot_product Project inside a codegen stage in:\n$plan")
  }

  test("type check rejects non-array input") {
    intercept[Exception] {
      spark.sql("SELECT dot_product(1.0, array(1.0))").collect()
    }
  }

  test("d2 on ragged arrays is null — same as the HOF form and the oracle") {
    // zip_with pads the shorter array with null elements, which nulls the
    // HOF fold; the native kernel must agree instead of silently summing
    // the common prefix (the round-6 ADVICE footgun)
    val df = spark.range(1).select(
      graft.operators.Pq.d2(
        array(lit(1.0), lit(2.0)), array(lit(1.0))).as("native"),
      graft.operators.Pq.d2Hof(
        array(lit(1.0), lit(2.0)), array(lit(1.0))).as("hof"))
    val r = df.head()
    assert(r.isNullAt(0), "native d2 on ragged arrays must be null")
    assert(r.isNullAt(1), "HOF d2 on ragged arrays should be null too")
  }

  test("native residual == HOF residual bit-for-bit on all embeddings") {
    // the r7 kernel: VectorSub replaces the per-corpus-vector zip_with
    // in the residual index build / pqResidualBooks training
    val cents: graft.operators.Ivf.Centroids = (0L to 1L).map(c =>
      c -> (0 until 64).map(i => (i + c + 1) * 0.25).toSeq)
    val both = embs.select(col("vec_id"), col("embedding"),
        (col("vec_id") % 2).as("cid"))
      .select(col("vec_id"),
        graft.operators.Pq.residual(col("embedding"), col("cid"), cents).as("native"),
        graft.operators.Pq.residualHof(col("embedding"), col("cid"), cents).as("hof"))
    val mismatches = both.filter(!(col("native") <=> col("hof"))).count()
    assert(mismatches == 0, s"$mismatches residual mismatches vs the HOF zip_with")
  }

  test("null element yields null across all three kernels, matching the HOF fold") {
    // parquet float lists read as containsNull=true, so the kernels must
    // not read a null slot as garbage 0.0 (the round-7 ADVICE footgun):
    // a null element nulls the whole result — for dot/d2 exactly what
    // the HOF fold computes (null element nulls the accumulation)
    val dirty = array(lit(1.0), lit(null).cast("double"), lit(3.0))
    val clean = array(lit(1.0), lit(2.0), lit(3.0))
    val r = spark.range(1).select(
      TextOps.dot(dirty, clean).as("dot_n"),
      TextOps.dotHof(dirty, clean).as("dot_hof"),
      graft.operators.Pq.d2(dirty, clean).as("d2_n"),
      graft.operators.Pq.d2Hof(dirty, clean).as("d2_hof"),
      VectorFunctions.subNative(clean, dirty).as("sub_n"),
      TextOps.dot(clean, clean).as("dot_clean"))
      .head()
    assert(r.isNullAt(0), "dot_product must null on a null element, not read garbage")
    assert(r.isNullAt(1), "HOF dot should null too (contract parity)")
    assert(r.isNullAt(2), "l2_dist_sq must null on a null element")
    assert(r.isNullAt(3), "HOF d2 should null too (contract parity)")
    assert(r.isNullAt(4), "vector_sub must null on a null element (loud contract)")
    assert(r.getDouble(5) == 14.0, "clean containsNull=true input still computes")
  }

  test("null-element guard costs nothing on a containsNull=false schema") {
    // array() of non-nullable columns proves elements non-null, so the
    // generated loop must carry no isNullAt check — inspect the actual
    // generated Java (row-dependent input so nothing constant-folds)
    val nonNull = array(col("id").cast("double"), lit(2.0))
    val df = spark.range(1).select(TextOps.dot(nonNull, nonNull).as("d"))
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(code.contains("Found 1 WholeStageCodegen"),
      s"expected the kernel inside a codegen stage:\n$code")
    assert(!code.contains("isNullAt"),
      s"no per-element null check expected for containsNull=false input:\n$code")
    assert(df.head().getDouble(0) == 4.0)
  }

  test("vector_sub on ragged arrays is null; stays inside whole-stage codegen") {
    val r = spark.range(1).select(
      VectorFunctions.subNative(array(lit(1.0), lit(2.0)), array(lit(1.0))).as("s"))
      .head()
    assert(r.isNullAt(0), "vector_sub on ragged arrays must be null")
    val plan = embs
      .select(VectorFunctions.subNative(col("embedding"), col("embedding")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vector_sub"),
      s"expected the vector_sub Project inside a codegen stage in:\n$plan")
  }
}
