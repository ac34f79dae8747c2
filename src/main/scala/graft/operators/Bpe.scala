package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + application — the real merge
  * loop (q78's regex splitter is the *pre*-tokenizer; this learns the
  * vocabulary). Each training round is ONE corpus aggregation: adjacent
  * symbol pairs are counted with map-side partial aggregation, the top
  * pair (count desc, pair asc — deterministic tie-break) is collected to
  * the driver, and the merge table grows by one. Applying merges is a
  * chain of literal `replace` calls — pure map-side expressions, so
  * encoding a 100 TB corpus with a trained table is zero-shuffle.
  *
  * Symbol sequences are space-separated and space-PADDED (" a b c "),
  * so a merge replaces the substring " a b " with " ab " without regex
  * lookbehind (RE2 on the oracle side has none). Replacement is
  * leftmost non-overlapping in BOTH engines (Java `String.replace`,
  * DuckDB `replace`), which is the documented application order:
  * consecutive overlapping occurrences ("a b a b" sharing the middle
  * space) merge one per pass, identically in both engines — parity by
  * construction, which is what the q113/q114 oracles hash-check.
  */
object Bpe {

  /** One merge: the pair "a b" and its fused form "ab". */
  final case class Merge(pair: String, merged: String, count: Long)

  /** " a b c " — the padded char-symbol sequence of a word. */
  def charSyms(word: Column): Column =
    concat(lit(" "), concat_ws(" ", split(word, "")), lit(" "))

  /** Adjacent symbol pairs of a padded sequence (empty when < 2 symbols —
    * total, the [[TextOps.shinglesK]] lesson).
    */
  def pairs(syms: Column): Column = {
    val toks = split(trim(syms), " ")
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** Apply a trained merge table (in order) to a padded sequence. */
  def applyMerges(syms: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(syms) { (s, m) =>
      replace(s, lit(s" ${m.pair} "), lit(s" ${m.merged} "))
    }

  /** Padded per-word symbol column for a corpus of text: one row per
    * word. The word explode is map-side; training aggregations shuffle
    * only (pair, count) partials.
    */
  def wordSyms(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .select(charSyms(col("word")).as("syms"))

  /** Train `rounds` merges. Each round: count pairs under all merges so
    * far, collect the top (count desc, pair asc) — one job per round,
    * one driver-side row each.
    */
  def train(docs: DataFrame, rounds: Int, textCol: String = "text"): Seq[Merge] = {
    val ws = wordSyms(docs, textCol)
    var merges = Seq.empty[Merge]
    for (_ <- 1 to rounds) {
      val top = ws.select(explode(pairs(applyMerges(col("syms"), merges))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(1)
        .collect()
      if (top.nonEmpty) {
        val pair = top(0).getString(0)
        merges = merges :+ Merge(pair, pair.replace(" ", ""), top(0).getLong(1))
      }
    }
    merges
  }
}
