package graft.functions

import graft.SparkSpec

/** The PROVIDER CONTRACT — the pinned test battery ANY
  * [[EmbeddingProvider]] must pass before the engine will serve it,
  * shipped ahead of a real ONNX MiniLM provider (the one declared
  * fidelity delta vs the reference's `Program.cs:64-79`; this
  * container has no ONNX runtime jar, so the provider itself cannot
  * ship yet). When one lands, REGISTER IT in [[providers]] below and
  * it runs this exact suite — nothing else in the engine needs to
  * change, because every consumer (chunker, pipeline, store, search)
  * reaches embeddings only through the trait.
  *
  * The contract (each clause is something a consumer RELIES on):
  *   1. fixed dimensionality — the store schema and every ANN code
  *      table are sized to it (the default provider must be 384-dim,
  *      matching all-MiniLM-L6-v2, so a future ONNX swap is
  *      drop-in for persisted stores);
  *   2. unit L2 norm (or the zero vector for empty text) — cosine
  *      scoring and the IVF-SQ L2↔cosine ranking equivalence assume
  *      normalized inputs at ingest;
  *   3. determinism — re-ingest idempotency and the sidecar
  *      refresh-equals-rebuild certificate (q242) both break under a
  *      nondeterministic embedder;
  *   4. instance-independence — a fresh instance with the same config
  *      must agree (executors each deserialize their own copy);
  *   5. batch == single — `embedAll` is the mapPartitions hot path;
  *      it must be a pure lift of `embed` (ONNX batching must not
  *      change the answer);
  *   6. serialization round-trip — the provider ships to executors
  *      via Java serialization; a transient-state bug would embed
  *      differently (or crash) remotely;
  *   7. no trivial collapse — distinct texts must not all map to one
  *      point (a broken model file typically collapses).
  */
class EmbeddingContractSpec extends SparkSpec {

  /** name -> (provider, expected dim). An ONNX MiniLM provider joins
    * this map to inherit the whole battery.
    */
  private def providers: Seq[(String, EmbeddingProvider, Int)] = Seq(
    ("hashing-default", Embedding.default, 384),
    ("random-projection", new RandomProjectionEmbedder(dim = 256,
      seed = 2025L), 256))

  private val corpus = Seq(
    "coral reefs support thousands of marine species",
    "black holes bend light around their event horizons",
    "the quarterly revenue grew by twelve percent",
    "a", "  ", "", "repeated repeated repeated repeated",
    "Ünïcòdé tëxt with élèments and 中文")

  for ((name, p, dim) <- providers) {

    test(s"[$name] contract 1+2: fixed $dim-dim, unit-norm or zero") {
      for (t <- corpus) {
        val v = p.embed(t)
        assert(v.length == dim, s"dim drift on '$t': ${v.length}")
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        assert(math.abs(n - 1.0) < 1e-4 || n == 0.0,
          s"non-unit non-zero norm $n on '$t'")
      }
    }

    test(s"[$name] contract 3+4: deterministic, instance-independent") {
      val again = providers.find(_._1 == name).get._2
      for (t <- corpus) {
        assert(p.embed(t).toSeq == p.embed(t).toSeq,
          s"same-instance nondeterminism on '$t'")
        assert(p.embed(t).toSeq == again.embed(t).toSeq,
          s"fresh-instance disagreement on '$t'")
      }
    }

    test(s"[$name] contract 5: embedAll is a pure lift of embed") {
      val batch = p.embedAll(corpus.iterator).map(_.toSeq).toSeq
      assert(batch == corpus.map(p.embed(_).toSeq),
        "batch path diverged from the single path")
    }

    test(s"[$name] contract 6: survives the executor serialization " +
        "round-trip unchanged") {
      val bytes = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bytes)
      oos.writeObject(p); oos.close()
      val back = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bytes.toByteArray))
        .readObject().asInstanceOf[EmbeddingProvider]
      for (t <- corpus)
        assert(back.embed(t).toSeq == p.embed(t).toSeq,
          s"deserialized copy disagrees on '$t'")
    }

    test(s"[$name] contract 7: no trivial collapse across distinct texts") {
      val distinct = corpus.filter(_.trim.nonEmpty).map(p.embed(_).toSeq)
      assert(distinct.distinct.size == distinct.size,
        "distinct texts collapsed to identical vectors")
    }
  }
}
