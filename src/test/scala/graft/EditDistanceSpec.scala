package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.EditDistance

/** [[graft.functions.EditDistance]] — the bit-parallel Myers kernel must
  * return EXACTLY the builtin `levenshtein()`'s distances (the q152
  * DuckDB oracle replays the builtin's math), across the block
  * boundaries (m = 64/128/192), dense small alphabets (heavy Peq
  * collisions), and code-point semantics (multibyte + supplementary
  * characters count as single edit positions).
  */
class EditDistanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Classic two-row DP over code points — the oracle-independent mirror. */
  private def dpDistance(a: String, b: String): Int = {
    val pa = a.codePoints().toArray
    val pb = b.codePoints().toArray
    if (pa.isEmpty) return pb.length
    var prev = Array.tabulate(pb.length + 1)(identity)
    var cur = new Array[Int](pb.length + 1)
    for (i <- 1 to pa.length) {
      cur(0) = i
      for (j <- 1 to pb.length) {
        val sub = prev(j - 1) + (if (pa(i - 1) == pb(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      val t = prev; prev = cur; cur = t
    }
    prev(pb.length)
  }

  private def randStr(rnd: scala.util.Random, len: Int, alphabet: String): String =
    (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString

  test("kernel == two-row DP on random pairs crossing the 64/128/192 block boundaries") {
    val rnd = new scala.util.Random(152)
    val alphabets = Seq("ab", "abcd", "abcdefghijklmnopqrstuvwxyz ")
    for (al <- alphabets; _ <- 1 to 60) {
      val la = rnd.nextInt(200)
      // near-equal lengths sometimes (the near-dup regime), free otherwise
      val lb = if (rnd.nextBoolean()) math.max(0, la + rnd.nextInt(9) - 4)
               else rnd.nextInt(200)
      val a = randStr(rnd, la, al)
      val b = randStr(rnd, lb, al)
      val got = EditDistance.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == dpDistance(a, b),
        s"len(${a.length},${b.length}) alphabet=${al.length}: got $got")
    }
  }

  test("kernel == builtin levenshtein over DataFrame pairs (codegen path), incl. multibyte") {
    val rnd = new scala.util.Random(43)
    val base = Seq(
      ("", ""), ("", "abc"), ("abc", ""), ("same", "same"),
      ("kitten", "sitting"), ("flaw", "lawn"),
      // multibyte: é precomposed vs decomposed differ as code points
      ("café", "café"),
      // supplementary plane: one code point, one edit position
      ("a😀b", "ab"),
      ("straße", "strasse"))
    val fuzz = (1 to 300).map { _ =>
      val l = randStr(rnd, rnd.nextInt(150), "abcde fgh")
      val r = if (rnd.nextBoolean()) {
        // perturb l: the q152 regime (small edits on a shared base)
        val sb = new StringBuilder(l)
        (0 until rnd.nextInt(5)).foreach { _ =>
          if (sb.nonEmpty) sb.setCharAt(rnd.nextInt(sb.length),
            ('a' + rnd.nextInt(26)).toChar)
        }
        sb.toString
      } else randStr(rnd, rnd.nextInt(150), "abcde fgh")
      (l, r)
    }
    val df = (base ++ fuzz).toDF("l", "r")
    val diverging = df.select(
        EditDistance.editDistanceNative(col("l"), col("r")).as("native"),
        levenshtein(col("l"), col("r")).as("builtin"))
      .filter(col("native") =!= col("builtin")).count()
    assert(diverging == 0)
  }

  test("distanceBounded: exact within the cap, -1 past it (random pairs)") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 120) {
      val a = randStr(rnd, rnd.nextInt(180), "abcd")
      val b = randStr(rnd, rnd.nextInt(180), "abcd")
      val cps = (EditDistance.toCodePoints(UTF8String.fromString(a)),
        EditDistance.toCodePoints(UTF8String.fromString(b)))
      val d = dpDistance(a, b)
      for (cap <- Seq(0, math.max(0, d - 1), d, d + 3)) {
        val got = EditDistance.distanceBounded(cps._1, cps._2, cap)
        val want = if (d <= cap) d else -1
        assert(got == want, s"d=$d cap=$cap got=$got (|a|=${a.length},|b|=${b.length})")
      }
    }
  }

  test("edit_distance_bounded expression == (full ≤ cap ? full : -1) under codegen") {
    val rnd = new scala.util.Random(431)
    val pairs = (1 to 200).map { _ =>
      val l = randStr(rnd, rnd.nextInt(160), "abcde fg")
      val r = if (rnd.nextBoolean()) {
        val sb = new StringBuilder(l)
        (0 until rnd.nextInt(6)).foreach { _ =>
          if (sb.nonEmpty) sb.setCharAt(rnd.nextInt(sb.length),
            ('a' + rnd.nextInt(26)).toChar)
        }
        sb.toString
      } else randStr(rnd, rnd.nextInt(160), "abcde fg")
      (l, r, rnd.nextInt(40))
    } ++ Seq(("", "", 0), ("", "abc", 2), ("abc", "", 3),
      ("a😀b", "ab", 0), ("same", "same", 0))
    val df = pairs.toDF("l", "r", "cap")
    val bad = df.select(
        EditDistance.editDistanceBoundedNative(col("l"), col("r"), col("cap"))
          .as("bounded"),
        EditDistance.editDistanceNative(col("l"), col("r")).as("full"),
        col("cap"))
      .filter(col("bounded") =!= when(col("full") <= col("cap"), col("full"))
        .otherwise(lit(-1)))
      .count()
    assert(bad == 0)
    // negative cap is a verdict, not an error
    val neg = Seq(("abc", "abc", -1)).toDF("l", "r", "cap").select(
      EditDistance.editDistanceBoundedNative(col("l"), col("r"), col("cap")))
      .head().getInt(0)
    assert(neg == -1)
  }

  test("exact-equality fast path and null propagation") {
    val df = Seq((Some("abc"), Some("abc")), (None, Some("x")),
      (Some("x"), None), (Some(""), Some(""))).toDF("l", "r")
    val rows = df.select(
      EditDistance.editDistanceNative(col("l"), col("r")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(rows.toSeq == Seq(0, null, null, 0))
  }
}
