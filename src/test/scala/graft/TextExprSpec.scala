package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.TextOps

/** [[graft.functions.MinHashSig]] / [[graft.functions.ShinglesK]]: the
  * native fused text kernels must be BIT-IDENTICAL to the higher-order-
  * function compositions they replace — the DuckDB oracles replay the
  * HOF math, so any divergence breaks the hash gate. Parity is asserted
  * over the real corpus plus the edge shapes (short docs, empty tokens,
  * multibyte text).
  */
class TextExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.queries.Tables(spark, dir, "documents")

  private def edgeDocs = Seq(
    "",                        // no tokens
    "one",                     // 1 token
    "one two",                 // 2 tokens → below k=3
    "a b c",                   // exactly 3
    "a  b   c  ",              // empty tokens from repeated/trailing spaces
    "naïve café über straße",  // multibyte
    "x y z x y z x y z"        // repeated shingles (multiplicity)
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("NfcNormalize: composition, idempotence, identity on normalized, nulls") {
    import spark.implicits._
    val decomposed = "café"
    val composed = "café"
    val df = Seq(Some(decomposed), Some(composed), Some("plain ascii"),
      Some(""), None).toDF("t")
    val got = df.select(TextFunctions.nfcNormalize(col("t")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq(composed, composed, "plain ascii", "", null))
    // idempotence over the corpus: normalize(normalize(x)) == normalize(x)
    val n2 = docs.select(
        TextFunctions.nfcNormalize(col("text")).as("a"),
        TextFunctions.nfcNormalize(
          TextFunctions.nfcNormalize(col("text"))).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(n2 == 0)
  }

  test("ShinglesK(text, k) == shinglesK(tokens(text), k) for k = 3 and 8, corpus + edges") {
    for (df <- Seq(docs.select(col("doc_id"), col("text")), edgeDocs); k <- Seq(3, 8)) {
      val mismatch = df.select(
          TextFunctions.shinglesFromText(col("text"), k).as("native"),
          TextOps.shinglesK(TextOps.tokens(col("text")), k).as("hof"))
        .filter(not(col("native") <=> col("hof"))).count()
      assert(mismatch == 0, s"k=$k: $mismatch rows diverge")
    }
  }

  test("MinHashSig(text, n) == array_min∘transform∘seededHash per component, corpus + edges") {
    for (df <- Seq(docs.select(col("doc_id"), col("text")), edgeDocs)) {
      val sh = TextOps.shingles3(TextOps.tokens(col("text")))
      val native = TextFunctions.minhashSigNative(col("text"), 8)
      val checks = (0 until 8).map(j =>
        not(element_at(native, j + 1) <=> TextOps.minhash(j, sh)))
      val mismatch = df.filter(checks.reduce(_ || _)).count()
      assert(mismatch == 0, s"$mismatch rows diverge from the HOF minhash")
    }
  }

  test("GramHashArray == array_distinct(shingles_k)+hash32 — per-doc array parity incl. order, corpus + edges, k = 3 and 8") {
    // the fused distinct-gram kernel must reproduce the compositional
    // law EXACTLY: same distinct gram hashes, same first-occurrence
    // order, an empty array under k tokens (the old pre-filter's rows
    // vanish identically under explode), and null for null text.
    for (df <- Seq(docs.select(col("doc_id"), col("text")), edgeDocs);
         k <- Seq(3, 8)) {
      val hof = when(size(TextOps.tokens(col("text"))) >= k,
        transform(array_distinct(
          TextFunctions.shinglesFromText(col("text"), k)),
          g => TextOps.hash32(g)))
        .when(col("text").isNotNull, array().cast("array<long>"))
      val mismatch = df.select(
          TextFunctions.gramHashArray(col("text"), k).as("fused"),
          hof.as("hof"))
        .filter(not(col("fused") <=> col("hof"))).count()
      assert(mismatch == 0, s"k=$k: $mismatch docs diverge from the HOF gram law")
    }
    // null text → null array (explode emits nothing, exactly like the
    // old size(split(null)) guard dropping the row)
    val nullDf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L, null: String))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    assert(nullDf.select(col("doc_id"), explode(
      TextFunctions.gramHashArray(col("text"), 3)).as("g")).count() == 0)
    // and the kernel runs inside whole-stage codegen (the reason it is
    // an array expression behind builtin explode, not a Generator)
    val p = docs.select(col("doc_id"), explode(
        TextFunctions.gramHashArray(col("text"), 8)).as("g"))
      .queryExecution.executedPlan.toString
    assert(p.contains("gram_hash_array") && p.linesIterator.exists(l =>
      l.contains("Generate") && l.trim.startsWith("*(")),
      s"generate not codegen'd:\n$p")
  }

  test("Md5Hash32 == conv(substring(md5(s),1,8),16,10) over corpus texts, shingles and edges") {
    for (df <- Seq(docs.select(col("text")), edgeDocs.select(col("text")))) {
      // raw texts, prefixed texts (the q127 sampling shape), and
      // shingle strings all hash identically to the builtin chain
      val shapes = Seq(col("text"), concat(lit("cset|"), col("text")))
      val diverge = shapes.map(c =>
        not(TextFunctions.hash32Native(c) <=> TextOps.hash32(c)))
        .reduce(_ || _)
      assert(df.filter(diverge).count() == 0, "hash32Native diverges")
    }
    val sh = docs.select(explode(
      TextFunctions.shinglesFromText(col("text"), 3)).as("sh"))
    assert(sh.filter(not(TextFunctions.hash32Native(col("sh")) <=>
      TextOps.hash32(col("sh")))).count() == 0, "shingle hashes diverge")
  }

  test("SimHash32(text, seed) == simhashBits HOF, unseeded and both seeds, corpus + edges") {
    for (df <- Seq(docs.select(col("doc_id"), col("text")), edgeDocs)) {
      val ws = TextOps.tokens(col("text"))
      val diverge =
        not(TextFunctions.simhash32Native(col("text")) <=> TextOps.simhash32(ws)) ||
        not(TextFunctions.simhash32Native(col("text"), Some(0)) <=>
          TextOps.simhash32Seeded(0, ws)) ||
        not(TextFunctions.simhash32Native(col("text"), Some(1)) <=>
          TextOps.simhash32Seeded(1, ws))
      val mismatch = df.filter(diverge).count()
      assert(mismatch == 0, s"$mismatch rows diverge from the HOF simhash")
    }
  }

  test("BigramProfileScores == transform/filter HOF scores, corpus + edges (incl. astral)") {
    val profiles = Seq(
      Seq("th", "he", "an", "aß", "ïv"),
      Seq("ab", " b", "b ", "é😀"),
      Seq("zz"))                       // never hits
    val astralDocs = Seq(
      "ab",                            // exactly one bigram
      "café😀x",                       // astral code point mid-string
      "😀😀😀",                        // astral-only
      "a  b ab",                       // repeated/space bigrams
      "naïve café über straße")        // multibyte latin
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (df <- Seq(docs.select(col("doc_id"), col("text")), astralDocs)) {
      val g = df.filter(length(col("text")) >= 2)
      val bigrams = transform(sequence(lit(1), length(col("text")) - 1),
        i => col("text").substr(i, lit(2)))
      val hof = profiles.map(p =>
        size(filter(bigrams, b => b.isin(p: _*))) / size(bigrams))
      val mismatch = g.select(
          TextFunctions.bigramProfileScores(col("text"), profiles).as("native"),
          array(hof: _*).as("hof"))
        .filter(not(col("native") <=> col("hof"))).count()
      assert(mismatch == 0, s"$mismatch rows diverge from the HOF scores")
    }
    // below the guard: < 2 code points → null scores (the documented
    // kernel contract; the HOF 0/0 would raise under ANSI instead)
    val short = Seq((0L, ""), (1L, "a"), (2L, "😀"))
      .toDF("doc_id", "text")
      .select(TextFunctions.bigramProfileScores(col("text"), profiles).as("sc"))
      .collect()
    assert(short.forall(_.isNullAt(0)), "sub-bigram texts must score null")
  }

  test("native kernels run inside whole-stage codegen (no CodegenFallback in the projection)") {
    val p = docs.select(TextFunctions.minhashSigNative(col("text"), 8),
        TextFunctions.shinglesFromText(col("text"), 3),
        TextFunctions.bigramProfileScores(col("text"), Seq(Seq("th", "he"))))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(p.linesIterator.next().trim.startsWith("*("),
      s"projection not inside a codegen stage:\n$p")
  }

  test("TopShingleCount == the compositional explode-hash-count-max twin (and codegen == interpreted)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b a"),              // "a b" x3, "b a" x3
      (2L, "x x x x x x"),                // "x x" x5
      (3L, "one two three four five"),    // all distinct
      (4L, "t"),                          // < 2 tokens -> 0
      (5L, "")).toDF("doc_id", "text")    // one empty token -> 0 for k=2
    val native = docs.select(col("doc_id"),
        graft.functions.TextFunctions.topShingleCount(col("text"), 2).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native(1L) == 3L && native(2L) == 5L && native(3L) == 1L &&
      native(4L) == 0L && native(5L) == 0L, s"$native")
    // compositional twin over the same law
    val twin = docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), explode(
        graft.functions.TextFunctions.shinglesFromText(col("text"), 2)).as("bg"))
      .select(col("doc_id"),
        conv(substring(md5(col("bg")), 1, 8), 16, 10).cast("long").as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id")).agg(max(col("n")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    twin.foreach { case (id, n) => assert(native(id) == n, s"doc $id: $n vs ${native(id)}") }
    // interpreted (eval) path agrees with the codegen'd plan
    val e = graft.functions.TopShingleCount(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("a b a b a b a")), 2)
    assert(e.eval(null) == 3L)
  }
}
