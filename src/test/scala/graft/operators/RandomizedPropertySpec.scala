package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded randomized property checks over the newer operators — many
  * random instances per property, fixed seeds (deterministic, no
  * flakes). These complement the fixture specs: a fixture pins one
  * crafted case, a property sweep pins the INVARIANT across a family
  * of inputs the fixtures didn't think of.
  */
class RandomizedPropertySpec extends SparkSpec {
  import spark.implicits._

  test("CDC: shared runs survive random prefix/suffix shifts (content-defined cuts)") {
    // For docs = randomPrefix ++ shared ++ randomSuffix with DIFFERENT
    // random paddings, CDC's content-defined cuts realign inside the
    // shared run, so a large fraction of it is flagged in BOTH docs at
    // every shift — the invariant the fixed grid (ParagraphDedup)
    // provably lacks. Shared run 240 tokens, mean chunk 16: boundary
    // chunks at each end may differ, interior chunks must match.
    val rnd = new scala.util.Random(101)
    val shared = (1 to 240).map(i => s"s$i")
    for (trial <- 1 to 5) {
      val docs = (0 until 3).map { d =>
        val pre = (1 to rnd.nextInt(11)).map(_ => s"p${rnd.nextInt(5000)}")
        val suf = (1 to rnd.nextInt(11)).map(_ => s"x${rnd.nextInt(5000)}")
        (d.toLong, (pre ++ shared ++ suf).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val cov = Cdc.dupSpans(df, "doc_id", "text", w = 4, modulus = 16,
          minDocFreq = 2)
        .groupBy(col("doc_id"))
        .agg(sum(col("e") - col("s") + 1).as("cov"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (d <- 0L until 3L)
        assert(cov.getOrElse(d, 0L) >= 120L,
          s"trial $trial doc $d: only ${cov.getOrElse(d, 0L)}/240 shared tokens flagged")
    }
  }

  test("quantilesByGroup: distributed fallback == driver path on random inputs") {
    val rnd = new scala.util.Random(202)
    val ps = Seq("p10" -> 0.1, "p50" -> 0.5, "p99" -> 0.99)
    for (trial <- 1 to 4) {
      val nGroups = 1 + rnd.nextInt(40)
      val data = (1 to 300).map { _ =>
        (s"g${rnd.nextInt(nGroups)}", (rnd.nextInt(5000) + 1).toDouble)
      }
      val df = data.toDF("g", "v").repartition(1 + rnd.nextInt(9))
      val a = Stats.quantilesByGroup(df, "g", "v", ps)
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      val b = Stats.quantilesByGroup(df, "g", "v", ps,
          maxDriverStateRows = 0L)
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      assert(a.keySet == b.keySet, s"trial $trial")
      for ((g, vals) <- a) assert(b(g) == vals, s"trial $trial group $g")
    }
  }

  test("packing: packByStart replays the prefix-sum rule; packGreedy never overflows") {
    val rnd = new scala.util.Random(303)
    for (trial <- 1 to 3) {
      val cap = 64 + rnd.nextInt(400)
      val docs = (0 until 200).map(i =>
        (i.toLong, (1 + rnd.nextInt(cap)).toLong))
      val df = docs.toDF("doc_id", "n_toks").repartition(1 + rnd.nextInt(7))
      // packByStart contract: bin = floor(cumsum_before / capacity),
      // exactly — replay the rule sequentially and compare.
      val byStart = Packing.packByStart(df, "doc_id", "n_toks",
          capacity = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      var cum = 0L
      for ((id, n) <- docs) {
        assert(byStart(id) == cum / cap, s"trial $trial doc $id")
        cum += n
      }
      // packGreedy contract: every doc exactly once; no bin over
      // capacity (all sizes <= cap here, so strictly).
      val greedy = Packing.packGreedy(df, "doc_id", "n_toks",
          capacity = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(greedy.map(_._1).sorted.toSeq == docs.map(_._1),
        s"trial $trial")
      greedy.groupBy(_._3).foreach { case (bin, g) =>
        val tot = g.map(_._2).sum
        assert(tot <= cap, s"trial $trial bin $bin holds $tot > $cap")
      }
    }
  }

  test("Pii: counts and redaction agree with JVM-regex replay on random plantings") {
    // Random documents with PII spans spliced at random interior
    // positions (the operator's synthesis only appends — this sweeps
    // positions it never produces), cross-validated against direct
    // java.util.regex application: Spark's regexp_* must agree with
    // the JVM on the shared pattern subset.
    val rnd = new scala.util.Random(404)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    def pii(i: Int): String = rnd.nextInt(4) match {
      case 0 => s"user$i@host$i.org"
      case 1 => s"${100 + rnd.nextInt(900)}-${100 + rnd.nextInt(900)}-${1000 + rnd.nextInt(9000)}"
      case 2 => s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}"
      case _ => (1 to 14).map(_ => rnd.nextInt(10)).mkString
    }
    val docs = (0 until 40).map { d =>
      val base = (1 to 20).map(_ => words(rnd.nextInt(words.size)))
      val withPii = (0 until rnd.nextInt(4)).foldLeft(base) { (acc, j) =>
        val at = rnd.nextInt(acc.size + 1)
        (acc.take(at) :+ pii(d * 10 + j)) ++ acc.drop(at)
      }
      (d.toLong, withPii.mkString(" "))
    }
    val out = Pii.redact(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5)))).toMap
    for ((id, text) <- docs) {
      def jvmCount(p: String) = p.r.findAllIn(text).length.toLong
      val expected = (jvmCount(Pii.EmailPat), jvmCount(Pii.Ipv4Pat),
        jvmCount(Pii.PhonePat), jvmCount(Pii.CardPat))
      val (e, i, ph, c, md5got) = out(id)
      assert((e, i, ph, c) == expected, s"doc $id counts")
      val jvmRed = text
        .replaceAll(Pii.EmailPat, "<EMAIL>")
        .replaceAll(Pii.Ipv4Pat, "<IP>")
        .replaceAll(Pii.PhonePat, "<PHONE>")
        .replaceAll(Pii.CardPat, "<CARD>")
      val jvmMd5 = java.security.MessageDigest.getInstance("MD5")
        .digest(jvmRed.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md5got == jvmMd5, s"doc $id redaction")
    }
  }
}
