package graft.operators

import graft.SparkSpec

/** Token-entropy (q132) and Zipf-fit (q133) numerics on inputs whose
  * answers are computed by hand in the same e4 integer space the
  * operators use. The DuckDB oracle certifies engine agreement; these
  * pin the arithmetic.
  */
class EntropyZipfSpec extends SparkSpec {
  import spark.implicits._

  private def entropy(texts: String*) =
    TextAnalysis.tokenEntropy(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  test("entropy pins to hand-computed e4 values") {
    val out = entropy(
      "a a b b",     // H = ln4 - (2·ln2 + 2·ln2)/4: e4 = 13863 - 6931
      "a a a a",     // zero entropy
      "a b c d e")   // max entropy ln5; all runs length 1
    assert(out(0L) == ((4L, 2L, 6932L, 0.5)))
    assert(out(1L) == ((4L, 1L, 0L, 0.25)))
    assert(out(2L) == ((5L, 5L, 16094L, 1.0))) // round(ln5·1e4)
  }

  test("templated text scores below diverse text") {
    val out = entropy(
      Seq.fill(20)("buy now click here").mkString(" "),
      (1 to 80).map(i => s"w$i").mkString(" "))
    assert(out(0L)._3 < out(1L)._3)
  }

  test("zipf two-point fit equals the line through the points") {
    // vocabulary {a: 100, b: 10}; topR=2 makes least squares exact.
    val df = Seq((0L, Seq.fill(60)("a").mkString(" ")),
      (1L, (Seq.fill(40)("a") ++ Seq.fill(10)("b")).mkString(" ")))
      .toDF("doc_id", "text")
    val r = Stats.zipfFit(df, "text", topR = 2).collect()(0)
    assert(r.getLong(0) == 2L)
    val x2 = math.round(math.log(2.0) * 10000).toDouble
    val y1 = math.round(math.log(100.0) * 10000).toDouble
    val y2 = math.round(math.log(10.0) * 10000).toDouble
    val slope = (y2 - y1) / x2
    assert(math.abs(r.getDouble(1) - slope) < 1e-9, r.getDouble(1))
    val intercept = (y1 + y2) / 2.0 - slope * (x2 / 2.0)
    assert(math.abs(r.getDouble(2) - intercept) < 1e-6, r.getDouble(2))
  }

  test("real corpus fits a negative power law") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    // the synthetic corpus draws from a small vocabulary (~31 tokens at
    // sf0.001), so the fit spans min(V, topR) ranks
    val r = Stats.zipfFit(docs, "text", topR = 1000).collect()(0)
    assert(r.getLong(0) > 10L && r.getLong(0) <= 1000L)
    assert(r.getDouble(1) < -0.1 && r.getDouble(1) > -3.0, r.getDouble(1))
  }

  test("heaps: a one-new-word-per-doc corpus gives the hand-computed " +
      "prefix curve and a sublinear positive exponent") {
    // Doc i = "w<i> common": prefix at cut c holds 2c tokens and c+1
    // distinct words. With ids 1..10 the integer thresholds are
    // 1 + 9i/10 → cuts (1, 2, 3, …, 10).
    val df = (1 to 10).map(i => (i.toLong, s"w$i common"))
      .toDF("doc_id", "text")
    val out = Stats.heapsFit(df, "doc_id", "text", checkpoints = 10)
      .collect()
    assert(out.length == 10)
    out.foreach { r =>
      val cut = r.getLong(1)
      assert(r.getLong(2) == 2 * cut, s"tokens at cut $cut")
      assert(r.getLong(3) == cut + 1, s"vocab at cut $cut")
    }
    val beta = out.head.getDouble(6)
    assert(beta > 0.0 && beta < 1.0, s"sublinear growth, got $beta")
    assert(out.forall(_.getDouble(6) == beta), "shared fit columns")
  }

  test("q155 oov: a rare word outside the top-16 vocabulary is the " +
      "only tail mass") {
    // Source "a": 16 words x 10 occurrences — they ARE the frozen
    // vocabulary (count 10 beats 3). Source "b": two vocab words plus
    // "rare" x 3 → 5 tokens, 3 OOV, rate 30000 div 5 = 6000 e4.
    val dir = java.nio.file.Files.createTempDirectory("oov-spec").toString
    val aText = (1 to 16).flatMap(i => Seq.fill(10)(s"w$i")).mkString(" ")
    Seq((1L, "a", aText), (2L, "b", "w1 w2 rare rare rare"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.CorpusQueries
      .queries("q155_oov_rate")(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((160L, 0L, 0L, 0L)))
    assert(out("b") == ((5L, 3L, 1L, 6000L)))
  }

  test("heaps: an exhausted vocabulary reports slope zero exactly") {
    // Every doc draws the same two words: V is flat at 2, y is
    // constant, and the least-squares slope is exactly 0.
    val df = (1 to 20).map(i => (i.toLong, "a b a")).toDF("doc_id", "text")
    val out = Stats.heapsFit(df, "doc_id", "text").collect()
    assert(out.forall(_.getLong(3) == 2L))
    assert(out.forall(_.getDouble(6) == 0.0))
    // Tokens still accumulate monotonically along the prefixes.
    val toks = out.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(toks.zip(toks.tail).forall { case (a, b) => a < b })
  }
}
