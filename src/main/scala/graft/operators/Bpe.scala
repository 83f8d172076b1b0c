package graft.operators

import scala.collection.mutable

/** Byte-pair-encoding tokenizer — trainer and encoder — in the shape
  * large corpora actually use (GPT-2/HF convention): the DISTRIBUTED
  * work is the word-frequency aggregate (one map-side-combinable pass
  * over the corpus); the merge loop then runs on the bounded weighted
  * vocabulary, and encoding is a per-distinct-word function whose
  * results join back to the corpus as a broadcast dictionary. The
  * corpus is never re-scanned per merge iteration.
  *
  * Merge-application convention (shared with the DuckDB oracle, which
  * replays training AND encoding from scratch in SQL): a symbol
  * sequence is its space-delimited string `' s1 s2 … '`; applying merge
  * (a, b) is the literal `replace(" a b ", " ab ")` — leftmost,
  * non-overlapping, scan resumes after the replacement. Java
  * `String.replace` and DuckDB `replace` implement identical semantics
  * (verified: `' a a a '` → `' aa a '`, `' a b a b '` → `' ab a b '`
  * in both), so the two engines agree bit-for-bit by construction.
  * Tie-break for the best pair: highest weighted count, then
  * lexicographic (a, b).
  */
object Bpe {

  /** `'abc'` → `' a b c '` (space-delimited symbols, space-bounded).
    * Splits on CODEPOINTS, not UTF-16 chars: the oracle segments with
    * a per-codepoint regex, and a per-char split would emit broken
    * surrogate halves for non-BMP input (emoji, rare CJK).
    */
  def spaced(word: String): String =
    " " + word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).mkString(" ") + " "

  /** Apply merges in learned order via literal replaces. */
  def applyMerges(sp: String, merges: Seq[(String, String)]): String =
    merges.foldLeft(sp) { case (s, (a, b)) =>
      s.replace(s" $a $b ", s" $a$b ")
    }

  /** The symbol sequence of a spaced form. */
  def symbols(sp: String): Seq[String] =
    sp.trim.split(" ").filter(_.nonEmpty).toSeq

  /** Learn up to `numMerges` merges from a weighted vocabulary. Each
    * iteration counts adjacent symbol pairs of the CURRENT segmentation
    * (weighted by word frequency), merges the best pair everywhere, and
    * stops early when no pair remains.
    */
  def trainMerges(vocab: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var cur = vocab.map { case (w, c) => (spaced(w), c) }
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      cur.foreach { case (sp, c) =>
        val sy = symbols(sp)
        sy.zip(sy.drop(1)).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + c)
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        cur = cur.map { case (sp, c) =>
          (sp.replace(s" ${best._1} ${best._2} ",
            s" ${best._1}${best._2} "), c)
        }
      }
      i += 1
    }
    merges.toSeq
  }

  /** Encode one word under learned merges. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    symbols(applyMerges(spaced(word), merges))
}
