package graft.operators

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** Seeded property loops (suite convention, deterministic) for the
  * round-8 bounded-state algorithms: count-min's one-sided guarantee on
  * random skewed streams, the KMV merge law q114 is built on, and BPE
  * reconstruction/order-independence invariants.
  */
class PipelinePropertySpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("count-min never undercounts and per-row mass is conserved (200 random streams)") {
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val d = 2 + rnd.nextInt(4)
      val w = 8 << rnd.nextInt(4)
      val keys = (1 to 1 + rnd.nextInt(3)).flatMap(h =>
        Seq.fill(20 + rnd.nextInt(100))(s"hot$h")) ++
        (1 to 30 + rnd.nextInt(200)).map(i => s"u$i")
      val stream = rnd.shuffle(keys)
      def bucket(r: Int, k: String): Int =
        (java.lang.Long.parseLong(md5hex(s"$r:$k").take(8), 16) % w).toInt
      val regs = Array.fill(d, w)(0L)
      stream.foreach(k => (0 until d).foreach(r => regs(r)(bucket(r, k)) += 1))
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong)
      // every hash row partitions the full stream
      (0 until d).foreach(r => assert(regs(r).sum == stream.size))
      truth.foreach { case (k, c) =>
        val est = (0 until d).map(r => regs(r)(bucket(r, k))).min
        assert(est >= c, s"undercount for $k: $est < $c")
      }
    }
  }

  test("KMV merge law: sketch(A ∪ B) = top-k of sketch(A) ∪ sketch(B) (200 random sets)") {
    val rnd = new scala.util.Random(13)
    (1 to 200).foreach { _ =>
      val k = 4 + rnd.nextInt(30)
      val a = (1 to 10 + rnd.nextInt(120)).map(_ => rnd.nextInt(500)).toSet
      val b = (1 to 10 + rnd.nextInt(120)).map(_ => rnd.nextInt(500)).toSet
      def sketch(s: Set[Int]): Seq[String] =
        s.toSeq.map(x => md5hex(s"v:$x")).sorted.take(k)
      val merged = (sketch(a) ++ sketch(b)).distinct.sorted.take(k)
      assert(merged == sketch(a ++ b),
        s"merge law broken at k=$k (|A|=${a.size}, |B|=${b.size})")
    }
  }

  test("BPE encode concatenates back to the word; token count never grows (300 random vocabs)") {
    val rnd = new scala.util.Random(17)
    (1 to 300).foreach { _ =>
      val alphabet = "abcd"
      val vocab = (1 to 3 + rnd.nextInt(12)).map { _ =>
        val w = (1 to 1 + rnd.nextInt(8))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        (w, 1L + rnd.nextInt(50))
      }.distinct
      val merges = Bpe.trainMerges(vocab, 1 + rnd.nextInt(8))
      vocab.foreach { case (w, _) =>
        val toks = Bpe.encodeWord(w, merges)
        assert(toks.mkString == w, s"lossy encode of '$w': $toks")
        assert(toks.size <= w.length)
        assert(toks.forall(_.nonEmpty))
      }
    }
  }

  test("BPE training is input-order independent") {
    val rnd = new scala.util.Random(19)
    val vocab = Seq(("abab", 9L), ("abc", 5L), ("bc", 7L), ("aab", 3L),
      ("cab", 4L), ("bb", 2L))
    val m0 = Bpe.trainMerges(vocab, 6)
    (1 to 20).foreach { _ =>
      assert(Bpe.trainMerges(rnd.shuffle(vocab), 6) == m0)
    }
  }
}
