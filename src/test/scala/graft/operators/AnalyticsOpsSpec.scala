package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 operator surface (q183–q188): Otsu thresholds, HLL rollup,
  * URL canonicalization, keyness, distinct-n diversity, consistent
  * hashing — hand-computed fixtures and the structural guarantees each
  * operator advertises.
  */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- Otsu q183

  test("otsuThreshold: clean bimodal histogram cuts between the modes") {
    // Group g: 10 rows at bin 1, 10 rows at bin 9 — any cut between
    // them separates fully; the objective is maximized on the whole
    // plateau 1..8 and the tie rule picks the smallest bin, so the
    // smallest KEPT bin is 2. Means: 100 and 900 at e2.
    val df = ((1 to 10).map(_ => ("g", 1L)) ++ (1 to 10).map(_ => ("g", 9L)))
      .toDF("grp", "s")
    val out = Curation.otsuThreshold(df, "grp", col("s")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("threshold") == 2L, r)
    assert(r.getAs[Long]("n_below") == 10L && r.getAs[Long]("n_above") == 10L)
    assert(r.getAs[Long]("mu_below_e2") == 100L)
    assert(r.getAs[Long]("mu_above_e2") == 900L)
  }

  test("otsuThreshold: per-group independence and loud guards") {
    val df = Seq(("a", 0L), ("a", 0L), ("a", 10L), ("a", 10L),
      ("b", 2L), ("b", 8L)).toDF("grp", "s")
    val out = Curation.otsuThreshold(df, "grp", col("s"))
      .orderBy("grp").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    // negative bins refuse loudly
    val e = intercept[IllegalArgumentException] {
      Curation.otsuThreshold(Seq(("a", -1L)).toDF("grp", "s"), "grp",
        col("s"))
    }
    assert(e.getMessage.contains(">= 0"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Curation.otsuThreshold(df.filter("false"), "grp", col("s"))
    }
    assert(e2.getMessage.contains("empty input"), e2.getMessage)
  }

  // ----------------------------------------------------- HLL rollup q184

  test("hllRollup: merged == direct, naive sum overcounts, exact in the " +
      "linear-counting regime") {
    // 3 partitions all containing the SAME 20 values: exact NDV 20,
    // merged/direct estimates agree (register max is associative) and
    // at tiny cardinality linear counting is exact; naive per-part sum
    // triple-counts.
    val rows = for (p <- 0 until 3; v <- 0 until 20)
      yield ("g", p.toLong, s"val$v")
    val out = Stats.hllRollup(rows.toDF("grp", "p", "v"), "grp",
      col("p"), col("v")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_parts") == 3L)
    assert(r.getAs[Long]("exact_ndv") == 20L)
    assert(r.getAs[Boolean]("merged_eq_direct"))
    assert(r.getAs[Long]("est_merged") == 20L)
    assert(r.getAs[Long]("sum_part_est") == 60L)
    assert(r.getAs[Long]("err_e4") == 0L)
  }

  test("hllRollup: estimate within the 1.6% theory band at 50k values") {
    val rows = (0 until 50000).map(v => ("g", (v % 5).toLong, s"u$v"))
    val r = Stats.hllRollup(rows.toDF("grp", "p", "v"), "grp",
      col("p"), col("v")).collect().head
    assert(r.getAs[Boolean]("merged_eq_direct"))
    val est = r.getAs[Long]("est_merged")
    assert(math.abs(est - 50000L) < 50000L * 0.05,
      s"est $est too far from 50000")
  }

  // ------------------------------------------- URL canonicalization q185

  test("canonicalizeUrl: the four planted noise classes all collapse") {
    val raws = Seq(
      "https://www.src3.co.uk/p/7?a=1&b=2",
      "https://WWW.SRC3.CO.UK/p/7?b=2&a=1&utm_source=feed",
      "https://www.src3.co.uk:443/p/7?utm_campaign=x&a=1&b=2#frag",
      "https://www.src3.co.uk/p/7/?a=1&gclid=zzz&b=2")
    val out = raws.toDF("u")
      .select(WebIngest.canonicalizeUrl(col("u")).as("c"))
      .distinct().collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "https://www.src3.co.uk/p/7?a=1&b=2")
  }

  test("canonicalizeUrl: http :80 stripped, other ports and real params " +
      "kept, empty query dropped") {
    val cases = Seq(
      "http://Host.Com:80/x" -> "http://host.com/x",
      "https://h.com:8443/x" -> "https://h.com:8443/x",
      "https://h.com/x?z=3&m=1" -> "https://h.com/x?m=1&z=3",
      "https://h.com/x?utm_source=a" -> "https://h.com/x",
      "https://h.com/" -> "https://h.com",
      "https://h.com/a//" -> "https://h.com/a")
    val out = cases.map(_._1).toDF("u")
      .select(col("u"), WebIngest.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(out(in) == want, s"$in -> ${out(in)}, wanted $want")
    }
  }

  test("withMessyUrl variants collapse 4:1 under canonicalization") {
    val df = (0L until 40L).map(i => (i, "srcA")).toDF("doc_id", "source")
    val canon = WebIngest.withMessyUrl(df, "doc_id", "source")
      .select(WebIngest.canonicalizeUrl(col("raw_url")).as("c"),
        col("raw_url"))
    assert(canon.select("c").distinct().count() == 10L)
    assert(canon.select("raw_url").distinct().count() == 40L)
  }

  // ---------------------------------------------------------- keyness q186

  test("keyness: a term concentrated in one group is its top keyword") {
    // "zebra" appears 10x, all in group A; shared filler everywhere.
    val filler = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      ("A", s"$filler zebra zebra zebra zebra zebra"),
      ("A", s"$filler zebra zebra zebra zebra zebra"),
      ("B", filler), ("B", filler), ("B", filler))
    val out = TextAnalysis.keyness(docs.toDF("grp", "text"), "grp", "text",
      minCount = 5, topK = 3).collect()
    val topA = out.filter(r => r.getString(0) == "A" && r.getLong(1) == 1L)
    assert(topA.length == 1)
    assert(topA.head.getAs[String]("term") == "zebra")
    assert(topA.head.getAs[Long]("n_obs") == 10L)
    assert(topA.head.getAs[Long]("g2_e4") > 0L)
    // zebra never appears in B, so it cannot be a B keyword; B's rows
    // are only terms over-represented in B.
    assert(!out.exists(r => r.getString(0) == "B" &&
      r.getAs[String]("term") == "zebra"))
  }

  test("keyness: the r16 double-ratio form equals the r15 integer-" +
      "product form below the old 3e9 budget") {
    // A varied corpus (multiple groups, shared + exclusive + skewed
    // terms) so several cells pass the filters with distinct margins.
    val rnd = new scala.util.Random(7)
    val vocabA = Seq("alpha", "beta", "gamma", "delta", "shared")
    val vocabB = Seq("omega", "sigma", "beta", "shared", "tau")
    val docs = (0 until 40).map { i =>
      val (g, v) = if (i % 2 == 0) ("A", vocabA) else ("B", vocabB)
      (g, (0 until 30).map(_ => v(rnd.nextInt(v.length))).mkString(" "))
    }
    val out = TextAnalysis.keyness(docs.toDF("grp", "text"), "grp",
      "text", minCount = 5, topK = 5)
    // Replay with the OLD arithmetic — integer products inside the ln
    // and the filter, integer-division exp — over the same cells.
    val cells = docs.toDF("grp", "text")
      .select(col("grp"), explode(split(lower(col("text")), " "))
        .as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("grp", "term").agg(count(lit(1)).as("a"))
    val w = org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.Column
    val lnOld = (num: Column, den: Column) =>
      round(log(num.cast("double") / den.cast("double")) * 10000, 0)
        .cast("long")
    val ct = (k: Column, row: Column, cT: Column, n: Column) =>
      when(k > 0, k * lnOld(k * n, row * cT)).otherwise(lit(0L))
    val old = cells
      .withColumn("tt", sum(col("a")).over(w.partitionBy(col("term"))))
      .withColumn("st", sum(col("a")).over(w.partitionBy(col("grp"))))
      .withColumn("n", sum(col("a")).over(
        w.partitionBy(lit(1)))) // tiny corpus: single-partition OK here
      .withColumn("b", col("tt") - col("a"))
      .withColumn("c", col("st") - col("a"))
      .withColumn("d", col("n") - col("st") - col("b"))
      .filter(col("a") >= 5 &&
        col("a") * col("n") > col("st") * col("tt"))
      .withColumn("g2_e4", lit(2L) * (
        ct(col("a"), col("st"), col("tt"), col("n")) +
          ct(col("b"), col("n") - col("st"), col("tt"), col("n")) +
          ct(col("c"), col("st"), col("n") - col("tt"), col("n")) +
          ct(col("d"), col("n") - col("st"), col("n") - col("tt"),
            col("n"))))
      .withColumn("exp_e4", expr("st * tt * 10000 div n"))
      .withColumn("rank", row_number().over(w.partitionBy(col("grp"))
        .orderBy(col("g2_e4").desc, col("term"))))
      .filter(col("rank") <= 5)
      .select(col("grp"), col("rank").cast("long").as("rank"),
        col("term"), col("a").as("n_obs"), col("exp_e4"), col("g2_e4"))
    val got = out.orderBy("grp", "rank").collect().map(_.toString).toSeq
    val want = old.orderBy("grp", "rank").collect().map(_.toString).toSeq
    assert(want.nonEmpty, "replay produced no keyword rows")
    assert(got == want,
      s"double-ratio form diverged from the integer-product form:\n" +
        s"got  $got\nwant $want")
  }

  // ------------------------------------------------------ distinct-n q187

  test("distinctNgrams: hand-computed totals and ratios") {
    // One doc "a b a b": unigrams 4 total / 2 distinct; bigrams
    // "a b","b a","a b" -> 3 total / 2 distinct; trigrams 2 total /
    // 2 distinct.
    val out = TextAnalysis.distinctNgrams(
        Seq(("s", "a b a b")).toDF("src", "text"), "src", "text", maxN = 3)
      .orderBy("n").collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("total_grams"),
        r.getAs[Long]("distinct_grams"), r.getAs[Long]("distinct_e4")))
    assert(out.toSeq == Seq((1L, 4L, 2L, 5000L), (2L, 3L, 2L, 6666L),
      (3L, 2L, 2L, 10000L)))
  }

  test("distinctNgrams: docs shorter than n contribute nothing at n") {
    val out = TextAnalysis.distinctNgrams(
        Seq(("s", "one"), ("s", "two words")).toDF("src", "text"),
        "src", "text", maxN = 3)
      .orderBy("n").collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("total_grams")))
    // n=3 has no rows at all (no doc has 3 tokens): group absent.
    assert(out.toSeq == Seq((1L, 3L), (2L, 1L)))
  }

  // ------------------------------------------------ consistent hash q188

  test("consistentShard: deterministic, covers all shards, and adding a " +
      "shard moves keys ONLY into the new shard") {
    val keys = (0L until 2000L).toDF("k")
    val asg = keys.select(col("k"),
      Layout.consistentShard(col("k"), 8).as("s8"),
      Layout.consistentShard(col("k"), 9).as("s9"))
      .localCheckpoint(true)
    // full coverage and sane balance at V=16 vnodes
    val counts8 = asg.groupBy("s8").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts8.keySet == (0L until 8L).toSet)
    // every moved key lands on the NEW shard (id 8)
    val movedElsewhere = asg.filter(col("s8") =!= col("s9") &&
      col("s9") =!= 8L).count()
    assert(movedElsewhere == 0L)
    // movement is bounded: well under 2x the ideal 1/9 share
    val moved = asg.filter(col("s8") =!= col("s9")).count()
    assert(moved > 0L && moved < 2 * 2000 / 9,
      s"moved $moved of 2000 — expected ~${2000 / 9}")
    // rerun is bit-identical (pure hash, no RNG)
    val again = keys.select(Layout.consistentShard(col("k"), 8).as("s"))
      .collect().map(_.getLong(0)).toSeq
    val first = asg.select("s8").collect().map(_.getLong(0)).toSeq
    assert(again == first)
  }

  // ---------------------------------------------------------- stitch q190

  test("Stitch.shard: exact k-token overlap; short docs pass through") {
    val df = Seq((3L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "s"),
      (4L, "a b c", "s")).toDF("doc_id", "text", "source")
    val out = Stitch.shard(df, "doc_id", "text", k = 4)
      .orderBy("shard_id").collect()
      .map(r => (r.getAs[Long]("shard_id"), r.getAs[Int]("part"),
        r.getAs[String]("text")))
    // n=10, k=4: half = 7 → first 1..7, second 4..10 (4-token overlap)
    assert(out.toSeq == Seq(
      (6L, 0, "t1 t2 t3 t4 t5 t6 t7"),
      (7L, 1, "t4 t5 t6 t7 t8 t9 t10"),
      (8L, 0, "a b c")))
  }

  test("Stitch round trip: detect the planted boundary, repair to the " +
      "original text; cross-doc pairs do not match") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "s"),
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11", "s"))
      .toDF("doc_id", "text", "source")
    val det = Stitch.detectAdjacent(Stitch.shard(docs, "doc_id", "text", 4),
      "source", "shard_id", "text", k = 4).orderBy("left_id").collect()
    // pairs: (2,3) own, (3,4) cross, (4,5) own
    assert(det.length == 3)
    val byPair = det.map(r => (r.getAs[Long]("left_id"),
      r.getAs[Boolean]("matched"),
      Option(r.getAs[String]("merged_text")))).toSeq
    assert(byPair(0) == (2L, true,
      Some("w1 w2 w3 w4 w5 w6 w7 w8 w9")))
    assert(byPair(1)._2 == false && byPair(1)._3.isEmpty)
    assert(byPair(2) == (4L, true,
      Some("x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11")))
  }

  test("Stitch.detectAdjacent: a right shard of exactly k tokens (full " +
      "containment) merges to the left text unchanged — no trailing space") {
    // The planted q190 fixture never produces a k-token second shard
    // (shard() keeps the right at >= 1.5k), so the edge is pinned here:
    // right == the overlap itself, merged must be the left text verbatim.
    val shards = Seq(
      (0L, "a b c d e", "s"),
      (1L, "b c d e", "s")).toDF("shard_id", "text", "source")
    val det = Stitch.detectAdjacent(shards, "source", "shard_id", "text",
      k = 4).collect()
    assert(det.length == 1)
    assert(det.head.getAs[Boolean]("matched"))
    assert(det.head.getAs[String]("merged_text") == "a b c d e")
  }

  // ------------------------------------------------------ bootstrap q192

  test("bootstrapMeanCi: CI brackets the true mean, deterministic, " +
      "multiplicity mass ~ Poisson(1)") {
    val rows = (1L to 400L).map(i => ("g", i, i % 100))
    val df = rows.toDF("grp", "k", "v")
    val out = Stats.bootstrapMeanCi(df, "grp", "v", "k", b = 40).collect()
    assert(out.length == 1)
    val r = out.head
    val mean = r.getAs[Long]("mean_e4")
    assert(r.getAs[Long]("n_rows") == 400L)
    assert(r.getAs[Long]("n_replicates") == 40L)
    assert(r.getAs[Long]("boot_lo_e4") < mean &&
      mean < r.getAs[Long]("boot_hi_e4"), r)
    // repartition invariance (pure hash, no RNG state)
    val again = Stats.bootstrapMeanCi(df.repartition(13), "grp", "v", "k",
      b = 40).collect().head
    assert(again == r)
  }

  test("PoissonThresholdsE52: multiplicity expectation is ~1") {
    // P(m=j) implied by the thresholds should match Poisson(1):
    // E[m] = sum of tail probabilities = sum_i (1 - T_i/2^52).
    val tot = 1L << 52
    val em = Stats.PoissonThresholdsE52
      .map(t => (tot - t).toDouble / tot).sum
    assert(math.abs(em - 0.9963) < 0.001, em) // 1 - tail mass past m=4
  }

  // ------------------------------------------------- encoding audit q193

  test("encodingAudit: counts exactly the planted corruption classes") {
    val df = Seq(
      ("s", "clean text here"),
      ("s", "bad � decode"),
      ("s", "bellchar"),
      ("s", "tab\tand newline\nare fine"),
      ("t", "clean")).toDF("src", "text")
    val out = TextAnalysis.encodingAudit(df, "src", "text")
      .orderBy("src").collect()
    val sRow = out.head
    assert(sRow.getAs[Long]("n_docs") == 4L)
    assert(sRow.getAs[Long]("n_replacement") == 1L)
    assert(sRow.getAs[Long]("n_control") == 1L)
    assert(sRow.getAs[Long]("repl_rate_e4") == 2500L)
    assert(out(1).getAs[Long]("n_replacement") == 0L)
  }

  // --------------------------------------------------- co-occurrence q194

  test("Cooccurrence.pairs: hand-computed supports and lift; power " +
      "users dropped; minSupport filters") {
    // u1 {1,2,3}, u2 {1,2}, u3 {2,3}, u4 {1,2} → N=4;
    // pair (1,2): 3 users; (2,3): 2; (1,3): 1 (dropped at minSupport 2).
    val df = Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1), (2L, 2),
      (3L, 2), (3L, 3), (4L, 1), (4L, 2)).toDF("u", "i")
    val out = Cooccurrence.pairs(df, "u", "i", minSupport = 2L)
      .collect().map(r => (r.getAs[Int]("item_a"), r.getAs[Int]("item_b"),
        r.getAs[Long]("n_both"), r.getAs[Long]("sup_a"),
        r.getAs[Long]("sup_b"), r.getAs[Long]("lift_e4")))
    // lift(1,2) = 3*4/(3*4) = 1.0 → 10000; lift(2,3) = 2*4/(4*2) = 1.0
    assert(out.toSeq == Seq((1, 2, 3L, 3L, 4L, 10000L),
      (2, 3, 2L, 4L, 2L, 10000L)), out.toSeq)
    // a power user holding every item must not flood the pair table
    val power = (1 to 100).map(i => (99L, i))
    val withPower = (Seq((1L, 1), (1L, 2), (2L, 1), (2L, 2)) ++ power)
      .toDF("u", "i")
    val out2 = Cooccurrence.pairs(withPower, "u", "i", minSupport = 2L,
      maxBasket = 64).collect()
    assert(out2.length == 1)
    assert(out2.head.getAs[Long]("n_both") == 2L)
  }

  test("canonicalizeUrl is IDEMPOTENT: canon(canon(u)) == canon(u) " +
      "over every messy variant and edge case") {
    // Canonicalization must be a projection — a second pass that
    // changes anything means re-canonicalizing stored URLs (e.g. after
    // a frontier merge) would split clusters.
    val messy = WebIngest.withMessyUrl(
        (0L until 200L).map(i => (i, s"src${i % 7}"))
          .toDF("doc_id", "source"), "doc_id", "source")
      .select(col("raw_url").as("u"))
    val edges = Seq("https://h.com/", "http://H.com:80/x?utm_source=1",
      "https://h.com:8443/a//?z=1&a=2#f", "https://h.com").toDF("u")
    val diff = messy.union(edges)
      .select(WebIngest.canonicalizeUrl(col("u")).as("c1"))
      .withColumn("c2", WebIngest.canonicalizeUrl(col("c1")))
      .filter(col("c1") =!= col("c2")).collect()
    assert(diff.isEmpty, diff.toSeq)
  }

  test("consistentShard is TOTAL: every key maps into [0, n), never " +
      "null, across shard counts") {
    val keys = (0L until 3000L).toDF("k")
    for (n <- Seq(2, 8, 9, 32)) {
      val bad = keys.select(Layout.consistentShard(col("k"), n).as("s"))
        .filter(col("s").isNull || col("s") < 0 || col("s") >= n)
        .count()
      assert(bad == 0L, s"n=$n")
    }
  }

  test("Stitch round trip holds across varied token counts (property " +
      "sweep over lengths 8..40)") {
    val docs = (8 to 40).map { n =>
      (n.toLong, (1 to n).map(i => s"w${n}_$i").mkString(" "), "s")
    }.toDF("doc_id", "text", "source")
    val det = Stitch.detectAdjacent(
      Stitch.shard(docs, "doc_id", "text", k = 4),
      "source", "shard_id", "text", k = 4)
    val own = det.filter(col("left_id") % 2 === 0 &&
        col("right_id") === col("left_id") + 1 && col("matched"))
      .select(expr("left_id div 2").as("doc_id"),
        col("merged_text"))
    val bad = docs.join(own, Seq("doc_id"))
      .filter(col("merged_text") =!= col("text")).count()
    val matched = own.count()
    assert(matched == 33L, s"only $matched of 33 lengths round-trip")
    assert(bad == 0L)
  }

  test("hashRing: positions are distinct and sorted") {
    val ring = Layout.hashRing(9, 16)
    assert(ring.length == 144)
    assert(ring.map(_._1).distinct.length == 144)
    assert(ring == ring.sortBy(_._1))
    assert(ring.map(_._2).toSet == (0 until 9).toSet)
  }
}
