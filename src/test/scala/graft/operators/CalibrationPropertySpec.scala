package graft.operators

import graft.SparkSpec

/** Seeded property sweeps cross-checking the round-15 statistics
  * operators against independent brute-force references (the
  * BucketedVectorStoreSpec model-sweep discipline): the distributed
  * window/minimax algebra must agree with the textbook sequential
  * definition on arbitrary inputs, not just the hand-picked fixtures.
  */
class CalibrationPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815L)

  test("isotonicFit == an independent brute-force minimax on random " +
      "bin tables, and is always monotone and range-bounded") {
    for (_ <- 1 to 10) {
      val nBins = 2 + rnd.nextInt(6)
      val bins = (0 until nBins).map { b =>
        val n = 1 + rnd.nextInt(19)
        (b.toLong, n.toLong, rnd.nextInt(n + 1).toLong)
      }
      val rows = bins.flatMap { case (b, n, pos) =>
        (0L until n).map(i => (b, if (i < pos) 1L else 0L))
      }
      val got = Calibration.isotonicFit(rows.toDF("bin", "y"), "bin", "y")
        .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
      // independent reference: the same minimax over e4 segment rates,
      // written as three nested loops over the bin table
      def rate(i: Int, j: Int): Long = {
        val sn = (i to j).map(bins(_)._2).sum
        val sp = (i to j).map(bins(_)._3).sum
        sp * 10000L / sn
      }
      val want = bins.indices.map { k =>
        (0 to k).map(i => (k until nBins).map(j =>
          rate(i, math.max(i, j))).min).max
      }
      bins.indices.foreach { k =>
        assert(got(k.toLong) == want(k), s"bins=$bins k=$k")
      }
      assert(want.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
      val rates = bins.indices.map(i => rate(i, i))
      assert(want.forall(v => v >= rates.min && v <= rates.max))
    }
  }

  test("brierDecomposition terms are non-negative and Murphy's " +
      "identity holds within truncation ulps on random cells") {
    for (_ <- 1 to 8) {
      val rows = (0 until (20 + rnd.nextInt(60))).map { _ =>
        ("g", (rnd.nextInt(11) * 1000).toLong, rnd.nextInt(2).toLong)
      }
      val r = Calibration.brierDecomposition(
        rows.toDF("src", "p", "y"), "src", "p", "y").head()
      val (brier, rel, res, unc) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(brier >= 0 && rel >= 0 && res >= 0 && unc >= 0)
      // Identity bound under e4 truncation: each truncated mean (ȳ_c
      // in rel/res, ȳ in res/unc) carries ε < 1 e4-ulp, and a squared
      // term picks up ≲ 2·10⁴·ε + ε² ≈ 2·10⁴ e8 per mean — three
      // truncated means ⇒ |brier − (rel − res + unc)| ≲ 6·10⁴ e8
      // (6·10⁻⁴ of the 0..1 Brier scale). Exact-division fixtures
      // (the q221 spec) read the identity exactly.
      assert(math.abs(brier - (rel - res + unc)) <= 60001,
        s"identity off: $brier vs ${rel - res + unc} on $rows")
    }
  }

  test("cusum == the textbook max(0, S + x − μ) recursion (D-scaled) " +
      "on random series") {
    for (_ <- 1 to 8) {
      val d = 5 + rnd.nextInt(10)
      val xs = (1 to d).map(_ => rnd.nextInt(50).toLong)
      val rows = xs.zipWithIndex.map { case (x, t) => ("k", t.toLong, x) }
      val got = Drift.cusum(rows.toDF("k", "t", "x"), "k", "t", "x")
        .collect().sortBy(_.getLong(1))
        .map(r => (r.getLong(3), r.getLong(4)))
      val total = xs.sum
      var sPos = 0L
      var sNeg = 0L
      xs.zipWithIndex.foreach { case (x, t) =>
        val u = d * x - total
        sPos = math.max(0L, sPos + u)
        sNeg = math.max(0L, sNeg - u)
        assert(got(t) == (sPos, sNeg), s"t=$t xs=$xs got=${got(t)}")
      }
    }
  }

  test("autocorr stays inside [-10000, 10000] with exact pair counts " +
      "on random series") {
    for (_ <- 1 to 6) {
      val d = 6 + rnd.nextInt(10)
      val rows = (0 until d).map(t => ("k", t.toLong,
        rnd.nextInt(40).toLong))
      val out = Drift.autocorr(rows.toDF("k", "t", "x"), "k", "t", "x",
        maxLag = 3).collect()
      out.foreach { r =>
        val (lag, np) = (r.getLong(1), r.getLong(2))
        assert(np == d - lag, s"pairs at lag $lag: $np vs ${d - lag}")
        if (!r.isNullAt(3))
          assert(math.abs(r.getLong(3)) <= 10000L, r.toString)
      }
    }
  }

  test("trimmedMeanByGroup == the sort-and-drop reference on random " +
      "value multisets") {
    for (_ <- 1 to 8) {
      val n = 5 + rnd.nextInt(40)
      val vs = (0 until n).map(_ => rnd.nextInt(30).toLong - 5L)
      val r = Stats.trimmedMeanByGroup(
        vs.map(("g", _)).toDF("g", "v"), "g", "v").head()
      val k = n / 10
      val kept = vs.sorted.slice(k, n - k)
      assert(r.getLong(1) == n && r.getLong(2) == k)
      assert(r.getLong(3) == kept.sum, s"vs=$vs")
      // Spark `div`, DuckDB `//` and Scala Long `/` all truncate
      // toward zero — negatives included
      assert(r.getLong(4) == kept.sum / kept.size,
        s"mean mismatch on $vs: ${r.getLong(4)}")
    }
  }
}
