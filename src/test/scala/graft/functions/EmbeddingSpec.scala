package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class EmbeddingSpec extends AnyFunSuite {
  private val e = Embedding.default

  test("embedding is 384-dim, deterministic, L2-normalized") {
    val v1 = e.embed("the quick brown fox")
    val v2 = e.embed("the quick brown fox")
    assert(v1.length == 384)
    assert(v1.toSeq == v2.toSeq)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("locality: overlapping text is more similar than disjoint text") {
    val a = e.embed("black holes form when massive stars collapse under gravity")
    val b = e.embed("black holes form when very massive stars collapse")
    val c = e.embed("coral reefs host thousands of marine fish species")
    assert(Embedding.cosine(a, b) > Embedding.cosine(a, c))
    assert(Embedding.cosine(a, a) > 0.9999)
  }

  test("empty text embeds to zero vector; cosine with it is 0") {
    val z = e.embed("")
    assert(z.forall(_ == 0f))
    assert(Embedding.cosine(z, e.embed("x")) == 0.0)
  }

  test("cosine is symmetric and bounded (seeded property loop)") {
    val rng = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s1 = rng.alphanumeric.take(rng.nextInt(40)).mkString
      val s2 = rng.alphanumeric.take(rng.nextInt(40)).mkString
      val (a, b) = (e.embed(s1), e.embed(s2))
      val ab = Embedding.cosine(a, b)
      assert(math.abs(ab - Embedding.cosine(b, a)) < 1e-12)
      assert(ab >= -1.0001 && ab <= 1.0001)
    }
  }

  test("chunk keys are valid UUIDs, deterministic, distinct per index") {
    val k0 = Embedding.chunkKey("doc.md", 0)
    assert(k0 == Embedding.chunkKey("doc.md", 0))
    assert(k0 != Embedding.chunkKey("doc.md", 1))
    assert(k0 != Embedding.chunkKey("other.md", 0))
    val u = java.util.UUID.fromString(k0)
    assert(u.version() == 5)
  }

  test("regex tokenizer: words, numbers, punctuation; subword split at 8") {
    assert(RegexTokenizer.tokenize("Hello, world 42!") ==
      Seq("hello", ",", "world", "42", "!"))
    assert(RegexTokenizer.tokenize("internationalization") ==
      Seq("internat", "##ionaliza", "##tion"))
    assert(WhitespaceTokenizer.tokenize("  a  b\tc ") == Seq("a", "b", "c"))
  }
}
