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
  private val Tok = """\p{L}+|\p{N}+|[^\p{L}\p{N}\s]""".r

  def tokenize(text: String): Seq[String] =
    Tok.findAllIn(text.toLowerCase).flatMap { t =>
      if (t.length <= 8 || !t.head.isLetter) Iterator.single(t)
      else t.grouped(8).zipWithIndex.map {
        case (piece, 0) => piece
        case (piece, _) => "##" + piece
      }
    }.toSeq
}
