package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sorted-set kernels for the near-dup VERIFY stage (q72/q87,
  * q45/q84, q118, q122 — the exact-Jaccard / containment check that runs
  * once per banded candidate pair).
  *
  * Why these exist (tier (b) of the custom-operator ladder): the
  * compositional verify is `size(array_intersect(sh_a, sh_b)) /
  * size(array_union(sh_a, sh_b))` over `array_distinct`'d STRING shingle
  * arrays. That shape pays three ways at scale:
  *   1. the 3-word shingle STRINGS (~20-30 bytes each, ~1 per corpus
  *      token) shuffle through BOTH sides of the candidate join;
  *   2. `array_intersect`/`array_union` build a UTF8String hash set per
  *      PAIR — within-cluster candidate counts grow quadratically with
  *      cluster size, so at 10x corpus scale the per-pair set-build is
  *      where the wall time lives (measured: q72 3.2x at 10x);
  *   3. intersection and union each walk both arrays — two passes.
  *
  * [[ShingleHashSet]] collapses a document's verify payload to a SORTED
  * DISTINCT `array<long>` of 56-bit md5-prefix shingle hashes, built in
  * one pass per document map-side (~3.5x fewer shuffled bytes than the
  * string form on this corpus). [[IntersectCardSorted]] /
  * [[JaccardSorted]] then verify a pair with a single linear merge scan
  * — no per-pair allocation beyond the loop counters.
  *
  * BIT-PARITY CONTRACT (spec-locked; what keeps the DuckDB oracle
  * valid): the hash of shingle s is the first 14 hex digits of `md5(s)`
  * read as an unsigned 56-bit value — DuckDB replays it as
  * `CAST(concat('0x', substr(md5(s), 1, 14)) AS BIGINT)`, Spark's
  * compositional twin is `conv(substring(md5(s), 1, 14), 16, 10)` —
  * over exactly the k-shingles of `split(text, ' ')` ([[ShinglesK]]
  * semantics: trailing empty tokens kept, fewer than k tokens yields an
  * empty array). Jaccard/containment over the hashed sets equals the
  * string-set value unless two DISTINCT shingles of the same document
  * pair collide in 56 bits (P ≈ n²/2^57 — at 10^6 distinct shingles
  * per doc pair, ~10^-5); both engines share any collision, so the
  * oracle comparison is exact even then. The reference's dedup
  * semantics (Jaccard over distinct shingle sets) is unchanged.
  */
case class ShingleHashSet(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column and k > 0, got ${child.dataType} / $k")

  override def nullSafeEval(t: Any): Any =
    ShingleHashSet.compute(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashSet.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

object ShingleHashSet {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static entry the generated code calls. Returns the sorted distinct
    * 56-bit shingle-hash set; fewer than k tokens yields an empty array
    * (the twin of `array_distinct` over [[ShinglesK]]'s empty result).
    *
    * Operates on the UTF8String's UTF-8 BYTES directly — no String
    * decode, no split array, no per-shingle StringBuilder (the former
    * String round-trip was the dominant map-side allocation of the
    * verify stage at 100× stress). The hash contract is unchanged: the
    * md5 input of shingle `w_i .. w_{i+k-1}` is the byte run from the
    * start of token i to the end of token i+k-1, which IS the UTF-8
    * encoding of the space-joined shingle, because the separator is the
    * single byte 0x20 and (in UTF-8) 0x20 can only BE the space
    * character — multi-byte sequences all have the high bit set. Token
    * boundaries from byte-level 0x20 scanning therefore equal
    * `String.split(" ", -1)`'s (empty tokens included), and each
    * shingle's digest equals `md5(utf8(w_i + " " + .. + w_{i+k-1}))`
    * bit for bit.
    */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val b = text.getBytes // one bounded copy per row; no decode
    val len = b.length
    var nTok = 1
    var i = 0
    while (i < len) { if (b(i) == 0x20) nTok += 1; i += 1 }
    if (nTok < k) return ArrayData.toArrayData(Array.empty[Long])
    // starts(j) = byte offset of token j; sentinel starts(nTok) = len + 1
    // so `starts(i + k) - 1` uniformly names the end of token i+k-1
    // (the offset of the separating space, or len for the last token)
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < len) { if (b(i) == 0x20) { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(nTok) = len + 1
    val n = nTok - k + 1
    val md = digests.get()
    val hs = new Array[Long](n)
    i = 0
    while (i < n) {
      val from = starts(i)
      md.reset()
      md.update(b, from, starts(i + k) - 1 - from)
      val h = md.digest()
      // first 14 hex digits == first 7 bytes, read unsigned big-endian
      hs(i) = ((h(0) & 0xffL) << 48) | ((h(1) & 0xffL) << 40) |
        ((h(2) & 0xffL) << 32) | ((h(3) & 0xffL) << 24) |
        ((h(4) & 0xffL) << 16) | ((h(5) & 0xffL) << 8) | (h(6) & 0xffL)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // dedupe in place on the sorted run
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    ArrayData.toArrayData(if (w == n) hs else java.util.Arrays.copyOf(hs, w))
  }
}

/** Shared input contract of the sorted-set binary kernels: both children
  * must be `array<long>` with non-null elements, sorted strictly
  * increasing ([[ShingleHashSet]]'s output). Element nullability is
  * rejected at ANALYSIS time — the merge scan reads elements with
  * `getLong`, which would silently read a null slot as garbage 0
  * (the VectorSub lesson, enforced here the hard way because nothing
  * in these kernels' pipelines produces nullable-element long arrays).
  */
trait SortedSetBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> columns with non-null " +
          s"elements (sorted distinct, e.g. shingle_hash_set output), got $l / $r")
    }
}

/** |A ∩ B| of two sorted distinct long arrays — one merge scan. */
case class IntersectCardSorted(left: Expression, right: Expression)
    extends SortedSetBinary {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_card_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedSetOps.intersectCard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedSetOps.intersectCard($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntersectCardSorted = copy(left = newLeft, right = newRight)
}

/** Jaccard |A∩B| / |A∪B| of two sorted distinct long arrays in one merge
  * scan. Both empty (the only zero-union case) yields NULL — the twin of
  * `size(array_intersect) / size(array_union)`'s 0/0 under ANSI-off
  * division, and of DuckDB's NULL on 0/0.
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends SortedSetBinary {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedSetOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}Box = graft.functions.SortedSetOps.jaccard($a, $b);
         |if (${ev.value}Box == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}Box.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaccardSorted = copy(left = newLeft, right = newRight)
}

/** Bucket-local near-dup verification in ONE generator: takes a
  * collected LSH bucket — `array<struct<doc_id, bkeys, shset>>`, the
  * members of one (band, bkey) group — plus the bucket's band index, and
  * emits the verified pairs `struct<doc_a, doc_b>` (ids ordered asc)
  * whose sorted-set Jaccard meets `threshold`.
  *
  * Why a generator instead of `pair_combinations` → filter (tier (b→c)
  * escalation, measured): the compositional form materializes BOTH
  * members' full payloads — two shingle sets, ~KBs — into an unsafe row
  * for EVERY i<j pair before the filter can drop it. Within-bucket pair
  * count is quadratic in bucket size, so at 100× replica scale that
  * copy stream was the q72 wall time (~82 s warm, CPU-bound, after the
  * shuffle was already linear). Here the payloads are read once into
  * object arrays per bucket and each pair costs one merge scan; only
  * the surviving (long, long) rows ever exist downstream.
  *
  * A pair is verified at its FIRST shared band only: pairs whose
  * `bkeys` already matched at an earlier band index are skipped (they
  * were emitted by that band's bucket), so each candidate pair costs
  * one Jaccard across the whole job, not one per shared band.
  */
case class VerifiedJaccardPairs(members: Expression, band: Expression,
    threshold: Double)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(members, band)
  override def prettyName: String = "verified_jaccard_pairs"

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (members.dataType, band.dataType) match {
      // containsNull = false REQUIRED on the members array and on the
      // band-key array (mirroring the shset element constraint): eval
      // reads them with getStruct/getUTF8String and a null element
      // arriving via the public SQL surface would NPE the task. The
      // producing plans (collect_list of struct over array(concat_ws..))
      // are non-null by construction, so this rejects only genuinely
      // unsafe inputs — at analysis time, with a message, instead of at
      // run time with a stack trace.
      case (ArrayType(StructType(Array(
            StructField(_, LongType, _, _),
            StructField(_, ArrayType(StringType, false), _, _),
            StructField(_, ArrayType(LongType, false), _, _))), false),
          IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (m, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<struct<long, array<string> non-null " +
          s"elems, array<bigint> non-null elems>> non-null elems, int), " +
          s"got ($m, $b)")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = members.eval(input)
    val bandV = band.eval(input)
    if (v == null || bandV == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val bandIdx = bandV.asInstanceOf[Int]
    // one materialization per bucket: ids, earlier band keys, sets
    val ids = new Array[Long](n)
    val earlier = new Array[Array[UTF8String]](n)
    val sets = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      val m = arr.getStruct(i, 3)
      // the element types are non-null by the analysis check; the struct
      // FIELDS can still be nullable-typed (parquet ids are), so a null
      // field fails loudly here instead of as a garbage getLong read or
      // an NPE inside the merge scan
      if (m.isNullAt(0) || m.isNullAt(1) || m.isNullAt(2))
        throw new IllegalArgumentException(
          s"$prettyName: null member field in bucket struct " +
            s"(doc_id/bkeys/shset must all be non-null)")
      ids(i) = m.getLong(0)
      val bk = m.getArray(1)
      val e = new Array[UTF8String](bandIdx)
      var k = 0
      while (k < bandIdx) { e(k) = bk.getUTF8String(k); k += 1 }
      earlier(i) = e
      sets(i) = m.getArray(2)
      i += 1
    }
    new Iterator[InternalRow] {
      private var ii = 0
      private var jj = 1
      private var nextRow: InternalRow = advance()
      private def advance(): InternalRow = {
        while (ii < n - 1) {
          val a = ii
          val b = jj
          jj += 1
          if (jj == n) { ii += 1; jj = ii + 1 }
          var shared = false
          var k = 0
          while (!shared && k < bandIdx) {
            if (earlier(a)(k).equals(earlier(b)(k))) shared = true
            k += 1
          }
          if (!shared) {
            val jac = SortedSetOps.jaccard(sets(a), sets(b))
            if (jac != null && jac.doubleValue() >= threshold) {
              val x = ids(a)
              val y = ids(b)
              return InternalRow(math.min(x, y), math.max(x, y))
            }
          }
        }
        null
      }
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; nextRow = advance(); r
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VerifiedJaccardPairs =
    copy(members = newChildren(0), band = newChildren(1))
}

/** Bucket-local fused EDIT-DISTANCE verifier — [[VerifiedJaccardPairs]]'
  * twin for q152, with the text payload in place of the shingle set.
  *
  * Why: the compose-then-join form shipped BOTH pair texts through two
  * pair-keyed exchanges — quadratic in clone-cluster size (measured at
  * 100× replica scale: 2.6 GB shuffle + 2.0 GB spill, 147 s warm). Here
  * a doc's text crosses the wire once per band; pairs expand, band-skip,
  * and verify inside the generator, and only surviving (doc_a, doc_b,
  * edit_dist, max_len) longs materialize as rows.
  *
  * Per-bucket cost discipline: each member's text converts to its
  * code-point array ONCE (shared across its pairs); a pair whose length
  * difference alone exceeds `distFrac × max_len` is rejected before any
  * DP (edit distance ≥ length difference); byte-equal texts short-cut to
  * distance 0; everything else runs the bit-parallel Myers kernel
  * ([[EditDistance.distance]]). A pair sharing bands i < k is emitted at
  * band i only (the carried earlier-band keys), so the output is
  * duplicate-free without a distinct.
  *
  * `distFrac` is a constructor literal (not an evaluated child), same
  * rationale as [[VerifiedJaccardPairs]]' threshold.
  */
case class VerifiedEditPairs(members: Expression, band: Expression,
    distFrac: Double)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(members, band)
  override def prettyName: String = "verified_edit_pairs"

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("edit_dist", LongType, nullable = false),
    StructField("max_len", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (members.dataType, band.dataType) match {
      // same non-null element discipline as VerifiedJaccardPairs: the
      // producing plan (collect_list of struct) is non-null by
      // construction; anything else is rejected at analysis time
      case (ArrayType(StructType(Array(
            StructField(_, LongType, _, _),
            StructField(_, ArrayType(StringType, false), _, _),
            StructField(_, StringType, _, _))), false),
          IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (m, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<struct<long, array<string> non-null " +
          s"elems, string>> non-null elems, int), got ($m, $b)")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = members.eval(input)
    val bandV = band.eval(input)
    if (v == null || bandV == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val bandIdx = bandV.asInstanceOf[Int]
    val ids = new Array[Long](n)
    val earlier = new Array[Array[UTF8String]](n)
    val texts = new Array[UTF8String](n)
    val cps = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      val m = arr.getStruct(i, 3)
      if (m.isNullAt(0) || m.isNullAt(1) || m.isNullAt(2))
        throw new IllegalArgumentException(
          s"$prettyName: null member field in bucket struct " +
            s"(doc_id/bkeys/text must all be non-null)")
      ids(i) = m.getLong(0)
      val bk = m.getArray(1)
      val e = new Array[UTF8String](bandIdx)
      var k = 0
      while (k < bandIdx) { e(k) = bk.getUTF8String(k); k += 1 }
      earlier(i) = e
      texts(i) = m.getUTF8String(2)
      cps(i) = EditDistance.toCodePoints(texts(i))
      i += 1
    }
    new Iterator[InternalRow] {
      private var ii = 0
      private var jj = 1
      private var nextRow: InternalRow = advance()
      private def advance(): InternalRow = {
        while (ii < n - 1) {
          val a = ii
          val b = jj
          jj += 1
          if (jj == n) { ii += 1; jj = ii + 1 }
          var shared = false
          var k = 0
          while (!shared && k < bandIdx) {
            if (earlier(a)(k).equals(earlier(b)(k))) shared = true
            k += 1
          }
          if (!shared) {
            val la = cps(a).length
            val lb = cps(b).length
            val maxLen = math.max(la, lb)
            val cap = distFrac * maxLen
            // length gate: dist >= |la - lb|, so a gap past the cap
            // can never verify — no DP
            if (math.abs(la - lb) <= cap) {
              // bounded kernel: a non-matching long pair abandons after
              // ~cap columns instead of the full scan (exact when kept)
              val dist =
                if (texts(a).equals(texts(b))) 0
                else EditDistance.distanceBounded(cps(a), cps(b),
                  math.floor(cap).toInt)
              if (dist >= 0 && dist <= cap) {
                val x = ids(a)
                val y = ids(b)
                return InternalRow(math.min(x, y), math.max(x, y),
                  dist.toLong, maxLen.toLong)
              }
            }
          }
        }
        null
      }
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; nextRow = advance(); r
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VerifiedEditPairs =
    copy(members = newChildren(0), band = newChildren(1))
}

/** Bucket-REPRESENTATIVE edit-distance verifier — the sub-quadratic
  * scale dial for [[VerifiedEditPairs]] at extreme clone cardinality
  * (q157; the q118 streaming shape, batch-side).
  *
  * [[VerifiedEditPairs]] verifies all i<j member pairs: exact pair
  * recall, but a b-member clone bucket pays ~b²/2 Myers calls — at
  * 1000-member cliques that is the plan's one structural cliff (the
  * round-11 verdict's task 1). A keep-list only needs CONNECTIVITY,
  * so this form verifies each member against the bucket REPRESENTATIVE
  * (the minimum doc_id — deterministic whatever order `collect_list`
  * delivered) and lets connected components absorb transitivity:
  * exactly b−1 kernel calls per bucket, O(b) by construction.
  *
  * Recall trade (spec-locked on the planted-clique corpus): an emitted
  * edge is still an EXACT verified pair (precision 1 — every rep edge
  * is also a [[VerifiedEditPairs]] edge, so rep components always
  * REFINE pairwise components); a pair can be missed only when neither
  * doc verifies against the rep in ANY of their shared bands. On clone
  * cliques (the regime that makes b large) every member matches the
  * rep and recall is total.
  *
  * Member payload is (doc_id, text) only — no band keys: the
  * first-shared-band skip cannot apply (whether a pair verified in an
  * earlier band depends on that bucket's rep, not on co-presence), so
  * duplicate (rep, member) edges across bands are reconciled by the
  * caller's `distinct` over identical rows instead.
  */
case class VerifiedEditRep(members: Expression, distFrac: Double)
    extends UnaryExpression with Generator with CodegenFallback {

  override def child: Expression = members
  override def prettyName: String = "verified_edit_rep"

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("edit_dist", LongType, nullable = false),
    StructField("max_len", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    members.dataType match {
      case ArrayType(StructType(Array(
            StructField(_, LongType, _, _),
            StructField(_, StringType, _, _))), false) =>
        TypeCheckResult.TypeCheckSuccess
      case m => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<long, string>> with " +
          s"non-null elements, got $m")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = members.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val ids = new Array[Long](n)
    val texts = new Array[UTF8String](n)
    var rep = 0
    var i = 0
    while (i < n) {
      val m = arr.getStruct(i, 2)
      if (m.isNullAt(0) || m.isNullAt(1))
        throw new IllegalArgumentException(
          s"$prettyName: null member field in bucket struct " +
            s"(doc_id/text must both be non-null)")
      ids(i) = m.getLong(0)
      texts(i) = m.getUTF8String(1)
      if (ids(i) < ids(rep)) rep = i
      i += 1
    }
    val repId = ids(rep)
    val repCps = EditDistance.toCodePoints(texts(rep))
    val repText = texts(rep)
    val r = rep
    new Iterator[InternalRow] {
      private var j = 0
      private var nextRow: InternalRow = advance()
      private def advance(): InternalRow = {
        while (j < n) {
          val b = j
          j += 1
          if (b != r) {
            val cb = EditDistance.toCodePoints(texts(b))
            val maxLen = math.max(repCps.length, cb.length)
            val cap = distFrac * maxLen
            if (math.abs(repCps.length - cb.length) <= cap) {
              val dist =
                if (repText.equals(texts(b))) 0
                else EditDistance.distanceBounded(repCps, cb,
                  math.floor(cap).toInt)
              if (dist >= 0 && dist <= cap)
                return InternalRow(repId, ids(b), dist.toLong, maxLen.toLong)
            }
          }
        }
        null
      }
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val row = nextRow; nextRow = advance(); row
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): VerifiedEditRep = copy(members = newChild)
}

object SortedSetOps {

  /** Merge-scan |A ∩ B|; inputs must be sorted distinct. */
  def intersectCard(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** Merge-scan Jaccard; null when both sets are empty (0/0). */
  def jaccard(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val union0 = na + nb
    if (union0 == 0) return null
    val inter = intersectCard(a, b)
    java.lang.Double.valueOf(inter.toDouble / (union0 - inter))
  }
}

object SetFunctions {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column API for [[ShingleHashSet]]. */
  def shingleHashSet(text: Column, k: Int): Column =
    GraftSqlBridge.column(ShingleHashSet(GraftSqlBridge.expression(text), k))

  /** Column API for [[IntersectCardSorted]]. */
  def intersectCardSorted(a: Column, b: Column): Column =
    GraftSqlBridge.column(IntersectCardSorted(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column API for [[JaccardSorted]]. */
  def jaccardSorted(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaccardSorted(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Generator Column for [[VerifiedJaccardPairs]]:
    * `df.select(SetFunctions.verifiedJaccardPairs(col("ms"), col("band"), 0.5))`
    * yields columns `doc_a`, `doc_b` — one row per verified pair.
    */
  def verifiedJaccardPairs(members: Column, band: Column,
      threshold: Double): Column =
    GraftSqlBridge.column(VerifiedJaccardPairs(
      GraftSqlBridge.expression(members), GraftSqlBridge.expression(band),
      threshold))

  /** Generator Column for [[VerifiedEditPairs]]: yields `doc_a`,
    * `doc_b`, `edit_dist`, `max_len` — one row per edit-verified pair.
    */
  def verifiedEditPairs(members: Column, band: Column,
      distFrac: Double): Column =
    GraftSqlBridge.column(VerifiedEditPairs(
      GraftSqlBridge.expression(members), GraftSqlBridge.expression(band),
      distFrac))

  /** Generator Column for [[VerifiedEditRep]]: yields `doc_a` (the
    * bucket-minimum rep), `doc_b`, `edit_dist`, `max_len` — b−1 kernel
    * calls per bucket, the sub-quadratic connectivity dial.
    */
  def verifiedEditRep(members: Column, distFrac: Double): Column =
    GraftSqlBridge.column(VerifiedEditRep(
      GraftSqlBridge.expression(members), distFrac))

  /** SQL surface for all three kernels — same codegen'd expressions the
    * Column API binds.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "shingle_hash_set", { exprs =>
      require(exprs.length == 2,
        s"shingle_hash_set(text, k) got ${exprs.length} args")
      ShingleHashSet(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue)
    })
    def binary(name: String,
        make: (Expression, Expression) => Expression): Unit =
      GraftSqlBridge.registerFunction(spark, name, { exprs =>
        require(exprs.length == 2,
          s"$name takes exactly 2 array arguments, got ${exprs.length}")
        make(exprs(0), exprs(1))
      })
    binary("intersect_card_sorted", IntersectCardSorted(_, _))
    binary("jaccard_sorted", JaccardSorted(_, _))
    // generator: the analyzer lifts it into a Generate node like explode
    GraftSqlBridge.registerFunction(spark, "verified_jaccard_pairs", { exprs =>
      require(exprs.length == 3,
        s"verified_jaccard_pairs(members, band, threshold) got ${exprs.length} args")
      // threshold is baked into the generator at construction, so it
      // must be evaluable WITHOUT a row — demand foldability up front
      // (eval(null) on a non-foldable arg fails with an opaque NPE)
      require(exprs(2).foldable,
        "verified_jaccard_pairs threshold must be a literal (foldable) " +
          s"expression, got ${exprs(2).sql}")
      // SQL numeric literals arrive as Decimal, not java.lang.Number
      VerifiedJaccardPairs(exprs(0), exprs(1), exprs(2).eval(null) match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: Number => n.doubleValue
        case other => throw new IllegalArgumentException(
          s"verified_jaccard_pairs threshold must be numeric, got $other")
      })
    })
  }
}
