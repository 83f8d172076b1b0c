package graft.operators

import graft.functions.{Embedding, EmbeddingProvider, Tokenizer, RegexTokenizer}
import graft.model.{Chunk, ElementRow}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Semantic-similarity chunker (SURVEY.md §2.3, C1).
  *
  * Splits each document's ordered element stream into chunks that are
  * (a) token-bounded and (b) split where the cosine similarity between
  * consecutive segments' embeddings drops below a per-document percentile
  * threshold — the observable behavior of the reference's
  * `SemanticSimilarityChunker` (instantiated with the tokenizer-bearing
  * options and the embedding generator at `VectorStoreCommands.cs:150-151`).
  *
  * Each chunk carries `content` (joined segment texts), `context` (the
  * heading trail in effect at the chunk's first segment — headers give
  * retrieval context), the owning `documentid`, and a deterministic key
  * (`Embedding.chunkKey`) so re-ingestion is idempotent.
  *
  * Scale design: chunk boundaries are sequential *within* a document but
  * documents are independent, so the operator is `groupByKey(doc_id) →
  * flatMapGroups` — one shuffle on doc_id, then embarrassingly parallel.
  * At 100 TB this scales linearly with executor count; no cross-partition
  * window functions (SURVEY §7.4 "chunker state").
  */
final class SemanticChunker(
    embedder: EmbeddingProvider = Embedding.default,
    tokenizer: Tokenizer = RegexTokenizer,
    maxTokens: Int = 2048,
    splitPercentile: Double = 0.25) extends Serializable {

  /** Chunk one document's elements (must be one doc_id). Pure + sequential;
    * called per group from [[chunks]] or directly in tests.
    */
  def chunkDocument(docId: String, elements: Seq[ElementRow]): Seq[Chunk] = {
    val ordered = elements.sortBy(_.element_seq)

    // Segment = one element's text; headers update the context trail
    // (level → trail depth) and also appear in content.
    final case class Seg(text: String, context: String, tokens: Int)
    val trail = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val segs = scala.collection.mutable.ArrayBuffer.empty[Seg]
    ordered.foreach { e =>
      val text = e.text.getOrElse("")
      if (text.nonEmpty && e.element_type != "error") {
        if (e.element_type == "header") {
          val lvl = e.level.getOrElse(1)
          while (trail.nonEmpty && trail.last._1 >= lvl) trail.remove(trail.length - 1)
          trail += ((lvl, text))
        }
        segs += Seg(text, trail.map(_._2).mkString(" > "),
          tokenizer.countTokens(text))
      }
    }
    if (segs.isEmpty) return Seq.empty

    // Boundary similarity: the provider's neighbor cosine (for the
    // default hashing embedder this is EXACT integer-derived arithmetic —
    // deterministic, oracle-replayable; see HashingEmbedder.neighborSims).
    val sims = embedder.neighborSims(segs.map(_.text).toSeq)
    // Per-document percentile threshold (deterministic): a boundary is cut
    // where similarity is in the lowest `splitPercentile` of the document's
    // own similarity distribution.
    val tau =
      if (sims.isEmpty) -1.0
      else {
        val sorted = sims.sorted
        val idx = math.min(sorted.length - 1,
          math.max(0, (splitPercentile * (sorted.length - 1)).round.toInt))
        sorted(idx)
      }

    val chunks = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    var curTexts = scala.collection.mutable.ArrayBuffer.empty[String]
    var curContext = segs.head.context
    var curTokens = 0
    var idx = 0
    def flush(): Unit = if (curTexts.nonEmpty) {
      val content = curTexts.mkString("\n")
      chunks += Chunk(Embedding.chunkKey(docId, idx), content, curContext,
        docId, idx)
      idx += 1
      curTexts = scala.collection.mutable.ArrayBuffer.empty[String]
      curTokens = 0
    }
    segs.zipWithIndex.foreach { case (seg, i) =>
      val semanticCut = i > 0 && sims.nonEmpty && sims(i - 1) <= tau &&
        segs.length > 2
      val tokenCut = curTokens + seg.tokens > maxTokens && curTexts.nonEmpty
      if (semanticCut || tokenCut) flush()
      if (curTexts.isEmpty) curContext = seg.context
      curTexts += seg.text
      curTokens += seg.tokens
    }
    flush()
    chunks.toSeq
  }

  /** Distributed chunking: shuffle once on doc_id, then per-doc sequential. */
  def chunks(elements: Dataset[ElementRow]): Dataset[Chunk] = {
    val spark = elements.sparkSession
    import spark.implicits._
    elements
      .filter(e => e.element_type != "error")
      .groupByKey(_.doc_id)
      .flatMapGroups((docId, it) => chunkDocument(docId, it.toSeq).iterator)
  }
}

object SemanticChunker {
  def default: SemanticChunker = new SemanticChunker()
}
