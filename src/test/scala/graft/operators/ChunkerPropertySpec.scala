package graft.operators

import graft.functions.RegexTokenizer
import graft.model.ElementRow
import org.scalatest.funsuite.AnyFunSuite

/** Chunker invariants over randomized documents (SURVEY §5.3.2), seeded
  * for determinism.
  */
class ChunkerPropertySpec extends AnyFunSuite {

  private val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon",
    "join", "scan", "filter", "window", "hash", "sort", "merge", "stream")

  private def randomDoc(rng: scala.util.Random): Seq[ElementRow] = {
    val nSegs = 1 + rng.nextInt(12)
    (0 until nSegs).map { i =>
      val nToks = 1 + rng.nextInt(40)
      val text = Seq.fill(nToks)(vocab(rng.nextInt(vocab.length)))
        .mkString(" ")
      ElementRow.para(s"doc", Seq(0), i, text, text)
    }
  }

  test("invariants: content preserved, token bound respected, keys unique") {
    val rng = new scala.util.Random(7)
    val chunker = new SemanticChunker(maxTokens = 64)
    (1 to 100).foreach { trial =>
      val doc = randomDoc(rng)
      val chunks = chunker.chunkDocument(s"doc$trial", doc)
      // 1. concat(chunks) ≡ concat(segments)
      assert(chunks.map(_.content).mkString("\n") ==
        doc.flatMap(_.text).mkString("\n"), s"trial $trial content")
      // 2. every chunk with >1 segment stays under the token bound (a
      // single oversized segment is allowed through alone — same as the
      // reference, which cannot split below element granularity)
      chunks.foreach { c =>
        val segs = c.content.split("\n")
        if (segs.length > 1)
          assert(RegexTokenizer.countTokens(c.content) <= 64 +
            RegexTokenizer.countTokens(segs.last),
            s"trial $trial token bound")
      }
      // 3. chunk_index dense from 0; keys unique and deterministic
      assert(chunks.map(_.chunk_index) == chunks.indices)
      assert(chunks.map(_.key).distinct.size == chunks.size)
      val again = chunker.chunkDocument(s"doc$trial", doc)
      assert(again.map(_.key) == chunks.map(_.key), s"trial $trial determinism")
    }
  }

  test("chunking is insensitive to element input order (sorts by seq)") {
    val rng = new scala.util.Random(11)
    (1 to 20).foreach { trial =>
      val doc = randomDoc(rng)
      val shuffled = rng.shuffle(doc)
      val c = SemanticChunker.default
      assert(c.chunkDocument("d", doc).map(_.content) ==
        c.chunkDocument("d", shuffled).map(_.content), s"trial $trial")
    }
  }
}
