package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-fixture specs for the PSI drift monitor (q150). The DuckDB
  * oracle certifies engine-equality on the testdata; these pin the
  * SEMANTICS on cohorts where the index is computable by hand.
  */
class DriftSpec extends SparkSpec {

  test("identical cohorts report zero PSI in every bin") {
    import spark.implicits._
    // Even/odd ids carry the SAME value distribution, so every bin's
    // smoothed shares coincide and each term is ln(1)-exact zero.
    val df = (0L until 40L).map(i => (i, ((i / 2) % 4).toString))
      .toDF("id", "v")
    val out = Drift.psiReport(df, col("id") % 2 === 0,
        Seq("v" -> col("v")))
      .collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Long]("psi_e4") == 0L, r.toString)
      assert(r.getAs[Long]("psi_total_e4") == 0L)
      assert(r.getAs[Long]("ref_share_e6") == r.getAs[Long]("cur_share_e6"))
    }
  }

  test("a total categorical flip matches the hand-computed index") {
    import spark.implicits._
    // ref: 4×'a'; cur: 4×'b'. Observed bins B=2, totals 4 → smoothed
    // shares 5/6 vs 1/6 in both directions. Each term:
    // (5/6 − 1/6)·ln(5) = 2/3·1.6094379… = 1.07295861 → 10730 at e4.
    val df = Seq((0L, "a"), (2L, "a"), (4L, "a"), (6L, "a"),
      (1L, "b"), (3L, "b"), (5L, "b"), (7L, "b")).toDF("id", "v")
    val out = Drift.psiReport(df, col("id") % 2 === 0,
        Seq("v" -> col("v")))
      .orderBy("bin").collect()
    assert(out.map(_.getAs[String]("bin")).toSeq == Seq("a", "b"))
    out.foreach { r =>
      assert(r.getAs[Long]("psi_e4") == 10730L, r.toString)
      assert(r.getAs[Long]("psi_total_e4") == 21460L)
    }
    // e6 truncating-div shares: 5·1e6/6 = 833333, 1e6/6 = 166666.
    assert(out(0).getAs[Long]("ref_share_e6") == 833333L)
    assert(out(0).getAs[Long]("cur_share_e6") == 166666L)
  }

  test("a one-sided bin stays finite and terms are non-negative") {
    import spark.implicits._
    // 'c' never appears in the reference cohort: without smoothing its
    // term would be ±∞·0; with add-one both shares are positive.
    val df = Seq((0L, "a"), (2L, "a"), (4L, "a"),
      (1L, "a"), (3L, "c"), (5L, "c")).toDF("id", "v")
    val out = Drift.psiReport(df, col("id") % 2 === 0,
      Seq("v" -> col("v"))).collect()
    assert(out.length == 2)
    out.foreach { r =>
      val t = r.getAs[Long]("psi_e4")
      assert(t >= 0L, s"PSI terms are non-negative by construction: $r")
    }
  }

  test("stacked multi-feature report is partition-invariant") {
    import spark.implicits._
    val df = (0L until 200L)
      .map(i => (i, i % 7, ((i * 31) % 5).toString)).toDF("id", "n", "s")
    val feats = Seq("n" -> (col("n") % 3), "s" -> col("s"))
    val one = Drift.psiReport(df.coalesce(1), col("id") % 2 === 0, feats)
      .orderBy("feature", "bin").collect().toSeq
    val many = Drift.psiReport(df.repartition(13), col("id") % 2 === 0,
        feats)
      .orderBy("feature", "bin").collect().toSeq
    assert(one == many)
    assert(one.map(_.getAs[String]("feature")).distinct.sorted ==
      Seq("n", "s"))
  }

  test("ksReport: hand-computed sup gap, argmax value, and the " +
      "identical-cohort zero") {
    import spark.implicits._
    // ref = {1,2,3,4}, cur = {3,4,5,6}: at v=2 cumR=2, cumC=0 →
    // |2·4 − 0·4| = 8, the max (v=3,4 give |3·4−1·4|=8 too — argmax
    // tie-break picks the SMALLEST v, 2). ks_e4 = 8·1e4 div 16 = 5000
    // (D = 0.5).
    val rows = Seq((1L, true), (2L, true), (3L, true), (4L, true),
      (3L, false), (4L, false), (5L, false), (6L, false))
    val df = rows.toDF("v", "ref")
    val out = Drift.ksReport(df, col("ref"), Seq("f" -> col("v")))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_ref") == 4L && r.getAs[Long]("n_cur") == 4L)
    assert(r.getAs[Long]("ks_num") == 8L)
    assert(r.getAs[Long]("ks_e4") == 5000L)
    assert(r.getAs[Long]("argmax_value") == 2L)
    // identical cohorts → D = 0 everywhere, argmax = smallest value
    val same = (1L to 10L).flatMap(v => Seq((v, true), (v, false)))
      .toDF("v", "ref")
    val z = Drift.ksReport(same, col("ref"), Seq("f" -> col("v")))
      .collect().head
    assert(z.getAs[Long]("ks_num") == 0L)
    assert(z.getAs[Long]("argmax_value") == 1L)
  }

  test("cusum: a clocklike series carries zero evidence; a sustained " +
      "step up accumulates s_pos from the onset and peaks at the end") {
    import spark.implicits._
    // 'flat': 5/day for 10 days — P_t = 0 exactly, both sides zero.
    // 'step': 0 for days 1-5 then 10 for days 6-10 (mean 5): s_pos
    // rises only after the shift; evidence peaks at the last day.
    val rows = (1L to 10L).map(d => ("flat", d, 5L)) ++
      (1L to 10L).map(d => ("step", d, if (d <= 5) 0L else 10L))
    val out = Drift.cusum(rows.toDF("k", "t", "x"), "k", "t", "x")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    val flat = out.filter(_._1 == "flat")
    assert(flat.forall(r => r._3 == 0L && r._4 == 0L))
    assert(flat.count(_._5) == 1 && flat.find(_._5).get._2 == 1L,
      "all-zero evidence ties resolve to the earliest day")
    val step = out.filter(_._1 == "step").sortBy(_._2)
    // Before the shift the upward statistic is zero (P is its own
    // running minimum); after it, s_pos grows by (10-5)*D = 50 per day.
    assert(step.take(5).forall(_._3 == 0L))
    assert(step.drop(5).map(_._3).toSeq ==
      Seq(50L, 100L, 150L, 200L, 250L))
    assert(step.find(_._5).get._2 == 10L, "peak evidence at the end")
    // The downward statistic mirrors: days 1-5 drift below the mean.
    assert(step.take(5).map(_._4).toSeq ==
      Seq(50L, 100L, 150L, 200L, 250L))
  }

  test("autocorr: an alternating series reads the exact negative " +
      "lag-1 and positive lag-2 correlations; a flat series reads NULL") {
    import spark.implicits._
    // x = 1,3,1,3,... (D=8): u = ∓8, den = 512; lag1 = 7·(−64) →
    // −8750 e4; lag2 = 6·64 → 7500 e4.
    val rows = (1L to 8L).map(t => ("alt", t, if (t % 2 == 1) 1L else 3L)) ++
      (1L to 8L).map(t => ("flat", t, 5L))
    val out = Drift.autocorr(rows.toDF("k", "t", "x"), "k", "t", "x",
      maxLag = 2).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap
    assert(out(("alt", 1L)) == (7L, Some(-8750L)))
    assert(out(("alt", 2L)) == (6L, Some(7500L)))
    assert(out(("flat", 1L)) == (7L, None))
    assert(out(("flat", 2L)) == (6L, None))
  }

  test("cusum guards the D*T overflow budget in-plan") {
    import spark.implicits._
    val rows = Seq(("k", 1L, Long.MaxValue / 2), ("k", 2L, Long.MaxValue / 2))
    val ex = intercept[Exception] {
      Drift.cusum(rows.toDF("k", "t", "x"), "k", "t", "x").collect()
    }
    assert(ex.getMessage != null)
  }
}
