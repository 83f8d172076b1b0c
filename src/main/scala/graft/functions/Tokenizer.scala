package graft.functions

/** Tokenizers (SURVEY.md §2.3 / §7.4).
  *
  * The reference counts tokens with a BERT WordPiece tokenizer loaded from
  * `vocab.txt` (`Program.cs:64-65,70`); the model asset is external even for
  * the reference, so the default here is a deterministic BPE-ish regex
  * tokenizer: words, numbers, and single punctuation — close to WordPiece
  * pre-tokenization. A vocab-driven WordPiece can be plugged in by
  * implementing [[Tokenizer]].
  */
trait Tokenizer extends Serializable {
  def tokenize(text: String): Seq[String]
  def countTokens(text: String): Int = tokenize(text).size
}

/** Whitespace splitter — the trivial baseline (matches the SQL-expressible
  * `split(text, ' ')` used by the oracle-checked queries).
  */
object WhitespaceTokenizer extends Tokenizer {
  def tokenize(text: String): Seq[String] =
    text.split("\\s+").toSeq.filter(_.nonEmpty)
}

/** BPE-ish pre-tokenizer: lowercased word pieces, digit runs, punctuation
  * as single tokens; long words split into 8-char pieces with a `##`
  * continuation marker (WordPiece-flavored sub-word behavior without a
  * vocab file).
  */
object RegexTokenizer extends Tokenizer {
  private[functions] val Tok = """\p{L}+|\p{N}+|[^\p{L}\p{N}\s]""".r

  def tokenize(text: String): Seq[String] =
    Tok.findAllIn(text.toLowerCase).flatMap { t =>
      if (t.length <= 8 || !t.head.isLetter) Iterator.single(t)
      else t.grouped(8).zipWithIndex.map {
        case (piece, 0) => piece
        case (piece, _) => "##" + piece
      }
    }.toSeq
}

/** WordPiece, greedy longest-match-first over a supplied vocabulary — the
  * algorithm behind the reference's token counter (BERT tokenizer loaded
  * from `vocab.txt`, reference `Program.cs:64-65,70`; the vocab file is an
  * external model asset even for the reference, so it is injected here:
  * pass `vocab.txt` lines via [[WordPieceTokenizer.fromVocabFile]] and the
  * [[graft.operators.SemanticChunker]] token budget counts real BERT
  * tokens).
  *
  * Pre-tokenization lowercases and splits words / digit runs / single
  * punctuation (the BERT "basic tokenizer" behavior); each word is then
  * greedily matched against the vocab with `##` continuation pieces; a
  * word with any unmatchable remainder becomes `[UNK]`, like the original.
  */
final class WordPieceTokenizer(vocab: Set[String], unk: String = "[UNK]",
    maxWordChars: Int = 100) extends Tokenizer {

  def tokenize(text: String): Seq[String] =
    RegexTokenizer.Tok.findAllIn(text.toLowerCase)
      .flatMap(pieces).toSeq

  private def pieces(word: String): Seq[String] = {
    if (word.length > maxWordChars) return Seq(unk)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (found == null && end > start) {
        val sub = (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocab.contains(sub)) found = sub else end -= 1
      }
      if (found == null) return Seq(unk)
      out += found
      start = end
    }
    out.toSeq
  }
}

object WordPieceTokenizer {
  /** Load a BERT-style vocab.txt: one token per line, blank lines skipped. */
  def fromVocabFile(path: String): WordPieceTokenizer = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try new WordPieceTokenizer(vocabLines(src))
    finally src.close()
  }

  /** Same loader over a classpath resource — the committed frozen vocab
    * (`src/main/resources/wordpiece_vocab.txt`) ships on the classpath so
    * the gated q253 replay and the specs read ONE source of truth.
    */
  def fromResource(name: String): WordPieceTokenizer = {
    val in = getClass.getClassLoader.getResourceAsStream(name)
    require(in != null, s"vocab resource $name missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try new WordPieceTokenizer(vocabLines(src))
    finally src.close()
  }

  /** The vocab as ordered lines (for oracle-side VALUES generation). */
  def vocabTokens(name: String): Seq[String] = {
    val in = getClass.getClassLoader.getResourceAsStream(name)
    require(in != null, s"vocab resource $name missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try guardVocab(src.getLines().map(_.trim).filter(_.nonEmpty).toList)
    finally src.close()
  }

  private def vocabLines(src: scala.io.Source): Set[String] =
    guardVocab(src.getLines().map(_.trim).filter(_.nonEmpty).toList).toSet

  /** A bare "##" entry is an EMPTY continuation suffix: the greedy
    * matcher here can never select it (the substring is non-empty), but
    * the q253 oracle's recursive CTE would match it at every position
    * with advance 0 — an infinite recursion. No real WordPiece vocab
    * carries it; fail loud on a bad vocab revision rather than letting
    * the two sides diverge.
    */
  private def guardVocab(tokens: List[String]): List[String] = {
    require(!tokens.contains("##"),
      "vocab contains a bare '##' (empty continuation) entry — " +
        "unmatchable by the tokenizer and an infinite loop in the " +
        "oracle's recursive replay")
    tokens
  }
}
