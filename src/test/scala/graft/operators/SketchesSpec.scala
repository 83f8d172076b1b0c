package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy envelopes for the sketch-backed 100 TB tiers, pinned against
  * their exact counterparts on real testdata — a sketch regression
  * (wrong hash, wrong sizing, swapped build/probe side) fails here, not
  * in production.
  */
class SketchesSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("decontaminateBloom: no false negatives vs exact, bounded fp inflation") {
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val eval = docs.filter(col("doc_id") % 50 === 0)
    val exact = Curation.decontaminate(train, eval, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    val bloom = Curation.decontaminateBloom(train, eval, "doc_id", "text",
        n = 3, expectedEvalNgrams = 1L << 16, fpp = 0.01)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(exact.keySet == bloom.keySet)
    // might_contain is one-sided: every exact hit must survive, and every
    // exact-contaminated doc must stay flagged.
    for ((id, (exHits, exFlag)) <- exact) {
      assert(bloom(id)._2 >= exHits, s"doc $id lost hits: bloom=${bloom(id)._2} exact=$exHits")
      if (exFlag) assert(bloom(id)._3, s"doc $id false negative")
    }
    // False-positive inflation across the corpus stays near the 1% fpp.
    val totalNg = bloom.values.map(_._1).sum
    val extraHits = exact.keys.map(id => bloom(id)._2 - exact(id)._1).sum
    assert(extraHits.toDouble / totalNg < 0.03,
      s"fp inflation ${extraHits.toDouble / totalNg} over $totalNg ngrams")
  }

  test("decontaminateBloomPortable: one-sided vs exact, word-packing sane") {
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val eval = docs.filter(col("doc_id") % 50 === 0)
    val exact = Curation.decontaminate(train, eval, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    // Small m on purpose — the portable tier's q78 sizing; collisions are
    // part of the certified semantics, the invariant is one-sidedness.
    val port = Curation.decontaminateBloomPortable(train, eval, "doc_id",
        "text", n = 3, numBits = 1 << 15, numHashes = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(exact.keySet == port.keySet)
    for ((id, (exHits, exFlag)) <- exact) {
      assert(port(id)._2 >= exHits,
        s"doc $id lost hits: portable=${port(id)._2} exact=$exHits")
      if (exFlag) assert(port(id)._3, s"doc $id false negative")
    }
    // A word-packing bug (wrong shift base, wrong word index) degenerates
    // toward an all-ones filter, which shows up as every gram hitting.
    val totalNg = port.values.map(_._1).sum
    val totalHits = port.values.map(_._2).sum
    assert(totalHits < totalNg, "filter saturated: every gram hit")
    // determinism: a second build sees identical verdicts
    val again = Curation.decontaminateBloomPortable(train, eval, "doc_id",
        "text", n = 3, numBits = 1 << 15, numHashes = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(again == port)
  }

  test("leakageReport: pair attribution, threshold, and ubiquity filter") {
    import spark.implicits._
    // eval 100 = "a b c d e" (3-grams: abc, bcd, cde); train 1 shares all
    // three, train 2 shares only abc.
    val train = Seq((1L, "a b c d e x"), (2L, "a b c q r s"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    def run(minShared: Int, maxTrainDf: Int) =
      Curation.leakageReport(train, eval, "doc_id", "text",
          n = 3, minShared = minShared, maxTrainDf = maxTrainDf)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // threshold: train 2's single shared gram stays below minShared=2
    val out = run(2, 100)
    assert(out == Map((100L, 1L) -> ((3L, 3L, 1.0))), out.toString)
    // ubiquity: with maxTrainDf=1, "a b c" (in both train docs) is
    // filtered BEFORE pairing, so train 1 drops to 2 shared grams
    val out2 = run(2, 1)
    assert(out2 == Map((100L, 1L) -> ((2L, 3L, 0.6667))), out2.toString)
  }

  test("profileApprox: exact nulls/min/max, HLL distincts within envelope") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    val exact = keyed(Stats.profile(orders, cols))
    val approx = keyed(Stats.profileApprox(orders, cols, rsd = 0.02))
    for (c <- cols) {
      assert(approx(c)._1 == exact(c)._1, s"$c nulls")
      assert(approx(c)._3 == exact(c)._3 && approx(c)._4 == exact(c)._4,
        s"$c min/max must be exact")
      val rel = math.abs(approx(c)._2 - exact(c)._2).toDouble /
        math.max(exact(c)._2, 1L)
      // rsd=0.02 is one sigma; 5x is a generous deterministic bound.
      assert(rel <= 0.10, s"$c ndv off by $rel (approx=${approx(c)._2} exact=${exact(c)._2})")
    }
  }

  test("profileApproxPortable: exact base stats, portable HLL in envelope") {
    // The q79 sketch (md5-hex HLL, m=4096 → ~1.6% standard error). The
    // oracle gate certifies cross-engine bit-equality; THIS pins that the
    // estimate is also close to the truth — 5% covers 3σ, and the
    // linear-counting branch makes tiny cardinalities exact.
    val orders = spark.read
      .parquet("/root/testdata/sf0.01/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    val exact = keyed(Stats.profile(orders, cols))
    val port = keyed(Stats.profileApproxPortable(orders, cols))
    for (c <- cols) {
      assert(port(c)._1 == exact(c)._1, s"$c nulls")
      assert(port(c)._3 == exact(c)._3 && port(c)._4 == exact(c)._4,
        s"$c min/max must be exact")
      val rel = math.abs(port(c)._2 - exact(c)._2).toDouble /
        math.max(exact(c)._2, 1L)
      assert(rel <= 0.05,
        s"$c ndv off by $rel (portable=${port(c)._2} exact=${exact(c)._2})")
    }
    assert(port("o_orderstatus")._2 == 3 && port("o_orderpriority")._2 == 5,
      "linear-counting branch must be exact on tiny cardinalities")
  }

  test("approx_percentile tier: within rank-error envelope of exact q38") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice")
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = keyed(li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_extendedprice, 0.5)").as("p50"),
      expr("percentile(l_extendedprice, 0.9)").as("p90")))
    val approx = keyed(li.groupBy(col("l_returnflag")).agg(
      expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50"),
      expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("p90")))
    for ((flag, (p50, p90)) <- exact) {
      // accuracy=10000 → rank error ~1e-4; values are well-spread prices,
      // so a 2% relative band is a loose deterministic envelope.
      assert(math.abs(approx(flag)._1 - p50) / p50 < 0.02, s"$flag p50")
      assert(math.abs(approx(flag)._2 - p90) / p90 < 0.02, s"$flag p90")
    }
  }

  test("hllRegister: hex-digit algebra matches bit-level leading zeros") {
    // The portable HLL's rho is computed from md5 hex CHARS; this pins it
    // against a reference that parses the same 52 bits as an integer and
    // counts leading zeros directly — a wrong CASE arm or off-by-one in
    // the digit table would shift estimates silently.
    import spark.implicits._
    val inputs = (1 to 500).map(i => s"value-$i")
    val got = inputs.toDF("v")
      .select(col("v"), Stats.hllRegister(md5(col("v"))).as("m"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    inputs.foreach { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bits = BigInt(hex.substring(3, 16), 16) // 13 hex chars = 52 bits
      val rho = if (bits == 0) 53 else 52 - bits.bitLength + 1
      assert(got(s) == math.min(rho, 50), s"$s: ${got(s)} vs $rho")
    }
  }

  test("q86 sample quantiles: within value envelope of exact percentiles") {
    // The deterministic 25% md5-sample rank pick (q86) vs the exact
    // per-group percentile. Rank error ~1/√(rate·n) ≈ 2% here; prices are
    // well-spread so 5% value error is a loose deterministic band.
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = keyed(li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_extendedprice, 0.5)").as("p50"),
      expr("percentile(l_extendedprice, 0.9)").as("p90")))
    val samp = keyed(graft.queries.Relational2
      .q86(spark, "/root/testdata/sf0.01")
      .select("l_returnflag", "p50", "p90"))
    for ((flag, (p50, p90)) <- exact) {
      assert(math.abs(samp(flag)._1 - p50) / p50 < 0.05, s"$flag p50")
      assert(math.abs(samp(flag)._2 - p90) / p90 < 0.05, s"$flag p90")
    }
  }

  test("keySkew: exact counts, shares and cumulative shares, stable ties") {
    import spark.implicits._
    val df = Seq.fill(6)("a").map(Tuple1(_)) ++
      Seq.fill(3)("b").map(Tuple1(_)) ++
      Seq.fill(3)("c").map(Tuple1(_)) ++ Seq(Tuple1("d"))
    val out = Stats.keySkew(df.toDF("k"), "k", topK = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 13 rows total; tie between b and c broken by key.
    assert(out.toSeq == Seq(
      ("a", 6L, r6(6.0 / 13), r6(6.0 / 13)),
      ("b", 3L, r6(3.0 / 13), r6(9.0 / 13)),
      ("c", 3L, r6(3.0 / 13), r6(12.0 / 13))))
  }
}
