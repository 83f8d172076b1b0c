package graft.functions

import java.security.MessageDigest

/** Text-embedding provider (SURVEY.md §2.4, E1).
  *
  * The reference embeds with a local ONNX BERT (all-MiniLM-L6-v2, 384-dim —
  * `Program.cs:64-79`, dims `VectorStoreOptions.cs:17`); the model weights
  * are an external asset even there (`appsettings.json` ships a placeholder
  * path). The default implementation here is a deterministic
  * feature-hashing embedder: token unigrams + bigrams hashed into `dim`
  * signed buckets, L2-normalized. Similar texts share token n-grams and so
  * land near each other in cosine space, which keeps semantic chunking and
  * KNN search meaningful offline; an ONNX-backed provider can be swapped in
  * behind the same trait.
  *
  * Pure function of the text ⇒ ingest-time and query-time embeddings agree
  * (the property the reference gets by registering one generator for both —
  * `Program.cs:76-79`), and re-ingestion is idempotent.
  */
trait EmbeddingProvider extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
  def embedAll(texts: Iterator[String]): Iterator[Array[Float]] =
    texts.map(embed)

  /** Cosine similarity between each consecutive pair of `texts` (size
    * n−1 for n texts) — the semantic chunker's boundary signal. Default:
    * cosine over the float embeddings. Providers whose representation
    * admits an EXACT formulation should override — cut decisions made on
    * these values must reproduce bit-for-bit in the DuckDB oracle, and
    * float32 normalization ulps are engine-specific.
    */
  def neighborSims(texts: Seq[String]): Seq[Double] = {
    val e = texts.map(embed)
    (1 until e.length).map(i => Embedding.cosine(e(i - 1), e(i)))
  }
}

final class HashingEmbedder(val dim: Int = 384) extends EmbeddingProvider {

  /** Stable 64-bit hash (FNV-1a); MessageDigest is not used per-token to
    * keep the hot loop allocation-free.
    */
  private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    val toks = RegexTokenizer.tokenize(text)
    def add(feature: String, weight: Float): Unit = {
      val h = fnv1a(feature)
      val bucket = java.lang.Long.remainderUnsigned(h, dim.toLong).toInt
      val sign = if ((h >>> 62 & 1L) == 0L) 1f else -1f
      v(bucket) += sign * weight
    }
    toks.foreach(t => add(t, 1f))
    toks.sliding(2).foreach {
      // The \\u0001 separator keeps bigram features injective: bare
      // concatenation would hash ("ab","c") and ("a","bc") identically.
      case Seq(a, b) => add(a + "\u0001" + b, 0.5f)
      case _ => ()
    }
    // L2 normalize; empty text → zero vector (cosine with anything = 0).
    var n = 0.0
    var i = 0
    while (i < dim) { n += v(i).toDouble * v(i); i += 1 }
    if (n > 0) {
      val inv = (1.0 / math.sqrt(n)).toFloat
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }

  /** The same featurization as [[embed]] but as UNNORMALIZED bucket sums
    * in ×2 integer space (unigram weight 1 → 2, bigram 0.5 → 1): every
    * value is exact, so cosines computed from them are deterministic
    * integer-derived doubles — no float32 normalization ulps, no
    * summation-order sensitivity. The ×2 scale cancels in cosine.
    */
  def embedRaw2(text: String): Array[Int] = {
    val v = new Array[Int](dim)
    val toks = RegexTokenizer.tokenize(text)
    def add(feature: String, w2: Int): Unit = {
      val h = fnv1a(feature)
      val bucket = java.lang.Long.remainderUnsigned(h, dim.toLong).toInt
      v(bucket) += (if ((h >>> 62 & 1L) == 0L) w2 else -w2)
    }
    toks.foreach(t => add(t, 2))
    toks.sliding(2).foreach {
      case Seq(a, b) => add(a + "\u0001" + b, 1)
      case _ => ()
    }
    v
  }

  /** Boundary sims from exact integer bucket sums: cosine = dot /
    * √(na·nb) where dot, na, nb are exact Long sums — bit-reproducible
    * in any engine from the same integer relations (the ÷4 of the ×2
    * scale cancels). Mathematically the same cosine as the float path
    * (cosine is scale-invariant); it differs only by the float32
    * normalization rounding the float path carries.
    */
  override def neighborSims(texts: Seq[String]): Seq[Double] = {
    val raw = texts.map(embedRaw2)
    (1 until raw.length).map { i =>
      val a = raw(i - 1); val b = raw(i)
      var dot = 0L; var na = 0L; var nb = 0L
      var j = 0
      while (j < dim) {
        dot += a(j).toLong * b(j)
        na += a(j).toLong * a(j)
        nb += b(j).toLong * b(j)
        j += 1
      }
      if (na == 0L || nb == 0L) 0.0
      else dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
    }
  }
}

object Embedding {
  val default: EmbeddingProvider = new HashingEmbedder(384)

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Deterministic UUIDv5-style key for chunk records (SURVEY §2.6):
    * re-ingesting a document reproduces identical keys, which is what makes
    * the document-replace upsert idempotent.
    */
  def chunkKey(documentId: String, chunkIndex: Int): String = {
    val md = MessageDigest.getInstance("SHA-1")
    val bytes = md.digest(s"graft:$documentId:$chunkIndex".getBytes("UTF-8"))
    bytes(6) = ((bytes(6) & 0x0f) | 0x50).toByte // version 5
    bytes(8) = ((bytes(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val bb = java.nio.ByteBuffer.wrap(bytes)
    new java.util.UUID(bb.getLong, bb.getLong).toString
  }
}
