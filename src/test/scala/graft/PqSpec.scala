package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq

/** [[graft.operators.Pq]]: product-quantization training, encoding, and
  * ADC search. Cross-engine exactness is the q108/q109 oracle's job;
  * this spec pins the operator-level invariants and the quality floor.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def embs = graft.queries.Tables(spark, dir, "embeddings")

  private lazy val books = Pq.train(embs, rounds = 1)

  test("trained codebooks keep full shape: M subspaces × K codes × SubDim dims") {
    assert(books.length == Pq.M)
    books.foreach { book =>
      assert(book.length == Pq.K)
      book.foreach(cv => assert(cv.length == Pq.SubDim))
    }
  }

  test("codes are in [0, K) and every vector encodes") {
    val n = embs.count()
    val enc = Pq.encode(embs, books)
    assert(enc.count() == n)
    val cols = (0 until Pq.M).map(m => col(s"c$m"))
    val bad = enc.filter(cols.map(c => c < 0 || c >= Pq.K).reduce(_ || _)).count()
    assert(bad == 0, s"$bad rows with out-of-range codes")
    // the codebook is actually used: more than one distinct code per subspace
    (0 until Pq.M).foreach { m =>
      val distinct = enc.select(col(s"c$m")).distinct().count()
      assert(distinct > 1, s"subspace $m collapsed to one code")
    }
  }

  test("packed codes round-trip: codeAt(packCodes(v)) == c0..c7 for every vector") {
    val both = embs.select(col("vec_id") +:
      (Pq.codeCols(col("embedding"), books) :+
        Pq.packCodes(col("embedding"), books).as("packed")): _*)
    val mismatches = (0 until Pq.M).map(m =>
      both.filter(Pq.codeAt(col("packed"), m) =!= col(s"c$m")).count()).sum
    assert(mismatches == 0, s"$mismatches packed-code mismatches")
    assert(both.count() == embs.count())
  }

  test("encoding is one map-side projection (no exchange but the output sort)") {
    val p = Pq.encode(embs, books).orderBy("vec_id")
      .queryExecution.executedPlan.toString
    val shuffles = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(shuffles <= 1, s"encode shuffles the corpus:\n$p")
    assert(!p.contains("Join"), s"encode must not join:\n$p")
  }

  test("shape is a training parameter: m=4, subDim=16, k=8 over the same 64-dim corpus") {
    val b = Pq.train(embs, rounds = 1, m = 4, subDim = 16, k = 8)
    assert(b.length == 4)
    b.foreach { book =>
      assert(book.length == 8)
      book.foreach(cv => assert(cv.length == 16))
    }
    val enc = Pq.encode(embs, b)
    assert(enc.columns.toSeq == ("vec_id" +: (0 until 4).map(m => s"c$m")))
    val cols = (0 until 4).map(m => col(s"c$m"))
    assert(enc.filter(cols.map(c => c < 0 || c >= 8).reduce(_ || _)).count() == 0)
    // the LUT path derives the same shape from the codebooks
    val qv = embs.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toIndexedSeq
    assert(Pq.adcLut(qv, b).map(_.length) == Seq.fill(4)(8))
  }

  test("sparse vec_ids fail seeding with the dense-id contract named") {
    val sparse = embs.filter(col("vec_id") >= 100)
    val err = intercept[IllegalArgumentException](Pq.train(sparse, rounds = 1))
    assert(err.getMessage.contains("DENSE vec_ids"), err.getMessage)
  }

  test("LUT search over stored codes equals inline ADC bit-for-bit") {
    // the search path (driver-computed LUT + element_at over stored
    // codes) must produce the exact doubles of the diagnostic inline
    // path — this is what lets q109/q110 switch to the index with the
    // oracle unchanged
    val qv = embs.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toIndexedSeq
    val lut = Pq.adcLut(qv, books)
    val q = embs.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val inline = embs.crossJoin(broadcast(q))
      .select(col("vec_id"), Pq.adc(col("embedding"), col("qv"), books).as("a"))
    val stored = Pq.encode(embs, books)
      .select(col("vec_id"), Pq.adcFromCodes(m => col(s"c$m"), lut).as("b"))
    val diverged = inline.join(stored, "vec_id").filter(col("a") =!= col("b")).count()
    assert(diverged == 0, s"$diverged vectors diverged between stored-code and inline ADC")
  }

  test("ADC from stored codes fails LOUD (null) on an out-of-range code") {
    // the flat M·K LUT indexes at m·K+code+1, so a corrupt code would
    // otherwise silently read the NEXT subspace's slot and produce a
    // plausible wrong distance; the range guard must null the whole sum
    val qv = embs.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toIndexedSeq
    val lut = Pq.adcLut(qv, books)
    val k = lut.head.length
    val one = Pq.encode(embs, books).filter(col("vec_id") === 1)
    def adcWith(c0: org.apache.spark.sql.Column) =
      one.select(Pq.adcFromCodes(m => if (m == 0) c0 else col(s"c$m"), lut).as("d"))
        .head()
    assert(!adcWith(col("c0")).isNullAt(0), "well-formed codes must score")
    assert(adcWith(lit(k)).isNullAt(0), s"code=$k (one past range) must null out")
    assert(adcWith(lit(-1)).isNullAt(0), "code=-1 must null out")
  }

  test("ADC approximation quality floor (uniform-random data is PQ's worst case)") {
    // The testdata embeddings are uniform random, where pairwise
    // distances CONCENTRATE — the adversarial regime for quantization
    // (real embedding manifolds cluster and quantize far better). So the
    // floor asserted here is the distance-approximation error and a
    // shortlist property, not strict top-k recall: both are fully
    // deterministic on this data (training has no RNG), measured once
    // and pinned.
    val e = embs
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val scored = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        Pq.adc(col("embedding"), col("qv"), books).as("ad"),
        round(Pq.d2(col("embedding"), col("qv")), 6).as("ex"))
      .collect()
    val relErr = scored.map(r => math.abs(r.getDouble(1) - r.getDouble(2)) / r.getDouble(2))
    assert(relErr.sum / relErr.length < 0.35,
      f"mean ADC relative error ${relErr.sum / relErr.length}%.3f — codebooks degraded")
    // shortlist-then-rerank (how a real IVF-PQ search uses ADC): the ADC
    // top-10 shortlist intersects the exact top-50 neighborhood
    val adcTop = scored.sortBy(r => (r.getDouble(1), r.getLong(0)))
      .take(10).map(_.getLong(0)).toSet
    val exact50 = scored.sortBy(r => (r.getDouble(2), r.getLong(0)))
      .take(50).map(_.getLong(0)).toSet
    assert((adcTop & exact50).size >= 5,
      s"ADC shortlist misses the exact neighborhood: ${(adcTop & exact50).size}/10 in top-50")
  }
}
