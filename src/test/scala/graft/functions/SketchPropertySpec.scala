package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Seeded property loops (suite convention, deterministic) for the two
  * vocabulary-level algorithms added in round 4: the Misra-Gries theorem
  * on random skewed inputs and WordPiece reconstruction invariants.
  */
class SketchPropertySpec extends AnyFunSuite {

  /** Driver-side replay of the MG update/merge the aggregate implements
    * (single buffer ≙ one partition; the distributed merge path is
    * covered by HeavyHittersSpec).
    */
  private def mgSketch(terms: Seq[String], k: Int): Map[String, Long] = {
    val buf = mutable.HashMap.empty[String, Long]
    terms.foreach { t =>
      if (buf.contains(t)) buf(t) += 1
      else if (buf.size < k) buf(t) = 1
      else {
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.filterInPlace((_, c) => c > 0)
      }
    }
    buf.toMap
  }

  test("MG theorem holds on 200 random skewed inputs: presence + undercount bound") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val k = 4 + rnd.nextInt(20)
      // Zipf-flavored corpus: few hot terms + long unique tail.
      val hot = (1 to 1 + rnd.nextInt(4)).flatMap(h =>
        Seq.fill(50 + rnd.nextInt(300))(s"hot$h"))
      val tail = (1 to 100 + rnd.nextInt(800)).map(i => s"t$i")
      val terms = rnd.shuffle(hot ++ tail)
      val n = terms.size
      val truth = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val s = mgSketch(terms, k)
      assert(s.size <= k)
      truth.foreach { case (t, c) =>
        if (c > n.toLong / k)
          assert(s.contains(t), s"term $t freq $c > n/k=${n / k} missing (k=$k)")
      }
      s.foreach { case (t, est) =>
        assert(est <= truth(t), s"overcount for $t")
        assert(est >= truth(t) - n.toLong / k, s"undercount bound broken for $t")
      }
    }
  }

  test("WordPiece reconstruction: no-UNK tokenizations concatenate back to the word") {
    val vocab = Set("a", "b", "ab", "abc", "##a", "##b", "##c", "##ab",
      "##bc", "##abc", "x", "##x")
    val wp = new WordPieceTokenizer(vocab)
    val rnd = new scala.util.Random(11)
    (1 to 500).foreach { _ =>
      val word = (1 to 1 + rnd.nextInt(10))
        .map(_ => "abcx".charAt(rnd.nextInt(4))).mkString
      val pieces = wp.tokenize(word)
      if (!pieces.contains("[UNK]")) {
        assert(pieces.head.take(2) != "##", pieces)
        assert(pieces.tail.forall(_.startsWith("##")), pieces)
        assert(pieces.head + pieces.tail.map(_.drop(2)).mkString == word,
          s"$word -> $pieces")
      } else {
        // UNK collapses the whole word, never mixes with pieces.
        assert(pieces == Seq("[UNK]"), pieces)
      }
    }
  }
}
