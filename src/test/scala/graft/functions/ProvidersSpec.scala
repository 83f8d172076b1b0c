package graft.functions

import graft.SparkSpec
import graft.operators.{IngestionPipeline, SemanticChunker}
import graft.sources.MarkdownSource
import graft.store.VectorStore
import java.nio.file.Files

/** The EmbeddingProvider trait is genuinely pluggable: a second,
  * structurally different deterministic provider (seeded random
  * projection) driven through chunker + store + search end-to-end, with
  * the contract properties (determinism, idempotent re-ingest, query/
  * ingest agreement, on-topic retrieval) holding under the swap. All
  * oracles stay on the hashing default — this spec certifies the SEAM.
  */
class ProvidersSpec extends SparkSpec {

  private val rp = new RandomProjectionEmbedder(dim = 256, seed = 2025L)

  test("RandomProjectionEmbedder: deterministic, unit-norm, dim-sized, " +
      "and a different featurization than the default") {
    val a = rp.embed("coral reefs support thousands of marine species")
    val b = rp.embed("coral reefs support thousands of marine species")
    assert(a.toSeq == b.toSeq, "same text must embed identically")
    assert(a.length == 256)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm")
    assert(rp.embed("").forall(_ == 0f), "empty text -> zero vector")
    // Different seeds produce different spaces (not a re-dressed default).
    val other = new RandomProjectionEmbedder(dim = 256, seed = 7L)
    assert(other.embed("coral reefs").toSeq != rp.embed("coral reefs").toSeq)
    // Token-overlap texts are closer than disjoint ones in its space.
    val near = Embedding.cosine(rp.embed("black holes bend light"),
      rp.embed("black holes trap light"))
    val far = Embedding.cosine(rp.embed("black holes bend light"),
      rp.embed("coral reefs marine fish"))
    assert(near > far, s"near=$near far=$far")
  }

  test("chunker + store + search are provider-consistent under swap: " +
      "end-to-end ingest and on-topic retrieval with the RP embedder") {
    val root = Files.createTempDirectory("graft-prov-store").toString
    val store = new VectorStore(spark, root)
    val chunker = new SemanticChunker(embedder = rp, maxTokens = 256)
    val elems = MarkdownSource.elements(spark,
      resourcePath("content/markdown"))
    val results = IngestionPipeline.run(elems, store, "rp",
      chunker = chunker, provider = rp).collect()
    assert(results.length == 10 && results.forall(_.succeeded))
    val stored = store.read("rp")
    assert(stored.select("embedding").head().getSeq[Float](0).length == 256,
      "store must carry the swapped provider's dimensionality")
    // Query embedded by the SAME provider (one generator for both sides
    // — the Program.cs:76-79 contract) retrieves the on-topic document.
    val hits = store.search("rp",
      "gravity so strong that light cannot escape the event horizon",
      k = 1, provider = rp).collect()
    assert(hits.length == 1)
    assert(hits.head.getAs[String]("documentid") == "black_holes.md")
    // Re-ingest under the swapped provider stays idempotent.
    val keysBefore = stored.select("key").collect().map(_.getString(0)).sorted
    IngestionPipeline.run(elems, store, "rp", chunker = chunker,
      provider = rp).collect()
    val keysAfter = store.read("rp").select("key").collect()
      .map(_.getString(0)).sorted
    assert(keysBefore.toSeq == keysAfter.toSeq)
  }

  test("VectorLiteralProvider: render/embed round-trips bit-exactly and " +
      "routes pre-embedded queries through the text search surface") {
    val v = Array(0.125f, -3.5e-3f, 1.0f, Float.MinPositiveValue)
    val p = new VectorLiteralProvider(dim = 4)
    assert(p.embed(VectorLiteralProvider.render(v)).toSeq == v.toSeq)
    intercept[IllegalArgumentException](p.embed("1.0 2.0"))
  }
}
